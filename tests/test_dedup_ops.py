"""Dedup-operator unit tests beyond oracle parity: the durable-checkpoint
path for iterative connected components, and multi-probe recall."""

from __future__ import annotations

import glob

from mapreduceproject_spark.operators import dedup as dd


def _cc(spark, checkpoint_dir=None):
    # two chains and a singleton-free triangle: {1,2,3,4}, {10,11}, {20,21,22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    rows = dd.connected_components(edges, checkpoint_dir=checkpoint_dir).collect()
    return {r["id"]: r["cluster_id"] for r in rows}


def test_connected_components_local_checkpoint(spark):
    got = _cc(spark)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable storage —
    same labels, and checkpoint files actually land in the directory
    (what survives executor loss on a real cluster)."""
    ckpt = str(tmp_path / "cc_ckpt")
    got = _cc(spark, checkpoint_dir=ckpt)
    assert got == _cc(spark)
    assert glob.glob(f"{ckpt}/*/rdd-*"), "reliable checkpoint files must exist"


def test_embedding_near_dup_multiprobe_superset(spark):
    """nprobe=2 must find every pair single-probe finds (candidates only
    grow) plus boundary pairs split across adjacent cells."""
    import random

    rng = random.Random(3)

    def vec(base, eps):
        return [b + eps * rng.random() for b in base]

    rows = []
    # two well-separated directions; near-dups straddle cell boundaries
    for i in range(40):
        base = [1.0, 0.0, 0.2] if i % 2 == 0 else [0.0, 1.0, 0.2]
        rows.append((i, vec(base, 0.3)))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    single = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_near_dup(
            emb, "vec_id", "embedding", num_centroids=4, threshold=0.9, nprobe=1
        ).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_near_dup(
            emb, "vec_id", "embedding", num_centroids=4, threshold=0.9, nprobe=2
        ).collect()
    }
    assert single <= multi
    assert len(multi) >= len(single)


def test_edit_distance_dedup_invariants(spark):
    """Canonical ordering, threshold bound, and zero-distance for
    byte-identical prefixes sharing a block."""
    from mapreduceproject_spark.operators.dedup import edit_distance_dedup

    rows = [
        (1, "en", 20, "hello world padding xyz"),
        (2, "en", 21, "hello world padding xyzq"),   # 1 edit inside prefix
        (3, "en", 20, "hello world padding xyz"),    # identical to 1
        (4, "en", 300, "hello world padding xyz"),   # same text, len-band excluded
        (5, "de", 20, "hello world padding xyz"),    # same text, lang-block excluded
        (6, "en", 20, "zzzzz totally different"),    # different block prefix
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long, text string")
    out = edit_distance_dedup(
        df, "doc_id", "text", block_cols=["lang"], length_col="n_chars",
        prefix_chars=40, block_prefix=4, length_band=8, max_dist=5,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in out}
    assert all(a < b for a, b in pairs)                  # canonical order
    assert all(d <= 5 for d in pairs.values())           # threshold bound
    assert pairs[(1, 3)] == 0                            # identical -> 0
    assert pairs[(1, 2)] == 1                            # one insertion
    assert (1, 4) not in pairs and (3, 4) not in pairs   # length band enforced
    assert not any(5 in p for p in pairs)                # lang block enforced
    assert not any(6 in p for p in pairs)                # prefix block enforced
