"""Unit + property tests for the round-4 curation/layout operators:
Gopher rule flags, DSIR importance weights, shingle novelty, SQ8 ANN,
and Z-order layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.operators import quality as q
from mapreduceproject_spark.operators import similarity as sim
from mapreduceproject_spark.operators.layout import (
    layout_extents,
    zorder_key,
)
from mapreduceproject_spark.operators.text_analysis import STOPWORDS


def test_gopher_flags_hand_truth(spark):
    docs = spark.createDataFrame(
        [
            # 30 words, all stopword-ish + normal lengths -> kept
            (1, "g", " ".join(["the data of and"] * 8)[: 10_000]),
            # 5 words -> fail_word_count (and has 2 stopwords)
            (2, "g", "the of tiny doc here"),
            # 30 words of 1-char tokens -> fail_mean_word_len + no stopwords
            (3, "g", " ".join(["x"] * 30)),
            # 30 words, every fifth a symbol token -> fail_symbol_ratio
            (4, "g", " ".join(("###" if i % 5 == 0 else "the" if i % 2 else "data") for i in range(30))),
        ],
        ["doc_id", "source", "text"],
    )
    flags = {
        r["doc_id"]: r
        for r in q.gopher_doc_flags(docs, "doc_id", "text", STOPWORDS).collect()
    }
    assert flags[1]["kept"] and not any(
        flags[1][c] for c in flags[1].asDict() if c.startswith("fail_")
    )
    assert flags[2]["fail_word_count"] and not flags[2]["fail_stopwords"]
    assert flags[3]["fail_mean_word_len"] and flags[3]["fail_stopwords"]
    assert flags[4]["fail_symbol_ratio"] and not flags[4]["kept"]


def test_dsir_weights_separate_target_vocabulary(spark):
    # target docs use vocabulary A, non-target vocabulary B; a held-out
    # doc written in vocabulary A must outweigh one written in B
    rows = [(i, "tgtword%d alpha beta" % (i % 3), True) for i in range(10)]
    rows += [(100 + i, "rawword%d gamma delta" % (i % 3), False) for i in range(10)]
    rows += [(200, "tgtword0 alpha beta", False), (201, "rawword0 gamma delta", False)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    w = {
        r["doc_id"]: r["weight_micro"]
        for r in q.dsir_weights(docs, "doc_id", "text", F.col("is_t")).collect()
    }
    assert w[200] > w[201]


def test_shingle_novelty_hand_truth(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),     # shingles {abc, bcd}
            (2, "a b c e"),     # shingles {abc, bce}
            (3, "x y z w"),     # fully unique
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in q.shingle_novelty(docs, "doc_id", "text").collect()}
    assert (out[1]["n_shingles"], out[1]["n_unique"], out[1]["novelty_bp"]) == (2, 1, 5000)
    assert (out[2]["n_shingles"], out[2]["n_unique"]) == (2, 1)
    assert out[3]["novelty_bp"] == 10_000


def morton_ref(a: int, b: int) -> int:
    """Pure-Python Morton reference at the operator's own width — the
    single reference implementation shared with test_properties."""
    from mapreduceproject_spark.operators.layout import ZORDER_BITS

    out = 0
    for i in range(ZORDER_BITS):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_morton(spark):
    # includes keys past the old 16-bit range: 65536+ must NOT alias
    rows = [
        (a, b)
        for a in (0, 1, 5, 255, 65535, 65536, 2_000_000, 2**31 - 1)
        for b in (0, 2, 7, 1023, 70_000, 2**31 - 1)
    ]
    df = spark.createDataFrame(rows, ["a", "b"]).select(
        "a", "b", zorder_key(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r["zkey"] == morton_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_layout_tightens_second_key_extents(spark, sf_dir):
    from mapreduceproject_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = {
        r["layout"]: r
        for r in layout_extents(
            li, "l_partkey", "l_suppkey", ["l_orderkey", "l_linenumber"], 16
        ).collect()
    }
    # the whole point: z-order must shrink the second key's summed extents
    # vs the linear layout (which sorts on the first key and leaves the
    # second key's per-file ranges near-full-width)
    assert out["zorder"]["sum_extent_b"] < out["linear"]["sum_extent_b"]
    assert out["linear"]["n_buckets"] == out["zorder"]["n_buckets"] == 16


def test_sq8_with_full_rerank_equals_bruteforce(spark, sf_dir):
    from mapreduceproject_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 4)
    brute = sim.brute_force_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=3
    ).withColumnRenamed("rank", "rnk")
    # rerank_factor covering the whole corpus makes SQ8 structurally exact:
    # every vector survives the candidate cut, so the rerank IS brute force
    sq8 = sim.sq8_rerank_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        dim=64, k=3, rerank_factor=(n + 2) // 3 + 1,
    )
    assert sorted(map(tuple, brute.collect())) == sorted(map(tuple, sq8.collect()))


def test_sq8_plan_broadcasts_stats_and_queries(spark, sf_dir):
    from mapreduceproject_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = sim.sq8_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 4), "vec_id", "embedding",
        "vec_id", "embedding", dim=64,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # candidate scoring must not shuffle the corpus on a join key: the only
    # exchanges are the two per-query window top-Ns
    assert plan.count("SortMergeJoin") == 0


def test_layout_extents_bucketing_matches_window_ntile(spark, sf_dir):
    """Round-10 rank retirement: layout_extents derives buckets from
    distributed_rank + closed-form NTILE arithmetic.  Pin it bit-equal to
    the SQL window NTILE on an INDIVISIBLE size (N % n_buckets != 0, the
    case where NTILE's first-r-buckets-get-one-extra rule matters) at
    several partition counts."""
    from pyspark.sql import Window

    from mapreduceproject_spark.operators.layout import zorder_key
    from mapreduceproject_spark.operators.ranking import distributed_rank
    from mapreduceproject_spark.sources.catalog import load_table

    # deterministic indivisible-size subset (no LIMIT: an unordered limit
    # may pick different rows per plan execution); N % 16 != 0 exercises
    # NTILE's first-r-buckets-get-one-extra rule
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"), F.lit(6)) == 0
    )
    base = li.select(
        F.col("l_partkey").alias("a"),
        F.col("l_suppkey").alias("b"),
        "l_orderkey",
        "l_linenumber",
        zorder_key(F.col("l_partkey"), F.col("l_suppkey")),
    )
    order = [F.col("zkey"), F.col("l_orderkey"), F.col("l_linenumber")]
    nb = 16
    assert base.count() % nb != 0
    w = Window.orderBy(*order)
    # multiset comparison keyed on the full order tuple: (okey, lineno)
    # alone is not unique in the fixture, and rows with an identical
    # order tuple are fully identical, so sorted tuples pin equality
    want = sorted(
        tuple(r)
        for r in base.withColumn("bucket", F.ntile(nb).over(w))
        .select("zkey", "l_orderkey", "l_linenumber", "bucket")
        .collect()
    )
    for parts in (1, 5, 32):
        ranked = (
            distributed_rank(base, order, rank_col="_rnk", num_partitions=parts)
            .crossJoin(F.broadcast(base.agg(F.count("*").cast("long").alias("_N"))))
            .withColumn("_q", F.expr(f"_N div {nb}"))
            .withColumn("_r", F.expr(f"_N % {nb}"))
        )
        got = sorted(
            tuple(r)
            for r in ranked.withColumn(
                "bucket",
                F.when(
                    F.col("_rnk") <= (F.col("_q") + 1) * F.col("_r"),
                    F.expr("(_rnk + _q) div (_q + 1)"),
                )
                .otherwise(
                    F.col("_r") + F.expr("(_rnk - (_q + 1) * _r + _q - 1) div _q")
                )
                .cast("int"),
            )
            .select("zkey", "l_orderkey", "l_linenumber", "bucket")
            .collect()
        )
        assert got == want, f"num_partitions={parts}"
