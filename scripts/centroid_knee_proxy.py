"""Measure the auto-centroid √n regime by CHUNKED execution (round-8).

SCALING.md's open evidentiary gap #3: the auto_centroid_count knee
(n > 4·10⁶ → C = 16·⌊√n⌋) had only analytic characterization, because a
single-job run at n > 4M pushes an n·√C routing exchange past this box's
disk.  But the IVF assignment stage is embarrassingly parallel in the
VECTORS — vector v's cell depends only on v and the fixed centroid
table — so a cluster would simply split the corpus across executors.
This script runs that exact decomposition on one box: K corpus chunks
assigned SEQUENTIALLY (each its own Spark job, scratch freed between),
then ONE in-cell candidate/verify stage over the union of the (id, cid,
rn) assignments (which are ~20 B/row — the 5M-row union is tiny even
though the vectors are not).

Fixture: `.scaling/knee5m/chunk<c>.parquet`, c=0..4 — 1M vectors per
chunk, replicas [500c, 500(c+1)) of the sf0.1 embeddings under the same
norm-preserving transform as the decade fixtures (scaling_run.emb_replica;
2500 < 8320 distinct transforms).  n = 5M → auto C = min(n/125=40000,
16·⌊√n⌋=35776, 65536) = 35776: the FIRST measured √-regime point.
A same-harness linear-regime baseline (chunk 0 alone: n = 1M →
C = 8000) runs first so the regime comparison shares every harness
detail.

The operator constants mirror dedup_embedding_cosine's scaled runs
(threshold 0.4, nprobe 2, assign twolevel); cites
operators/dedup.py::embedding_near_dup and
operators/similarity.py::assign_cells — the measured stages ARE those
operators' stages, just materialized at the chunk boundary.

Usage:
  python scripts/centroid_knee_proxy.py --build-only   # fixture only
  python scripts/centroid_knee_proxy.py                # build if absent, run
Merges results into measurements/centroid_knee_latest.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

CHUNKS = 5
REPLICAS_PER_CHUNK = 500
SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = Path(__file__).resolve().parent.parent
FIX = ROOT / ".scaling" / "knee5m"
ARTIFACT = ROOT / "measurements" / "centroid_knee_latest.json"
THRESHOLD, NPROBE = 0.4, 2


def build(spark) -> None:
    from pyspark.sql import functions as F

    from scaling_run import _write_chunked, emb_replica

    if FIX.exists():
        shutil.rmtree(FIX)
    FIX.mkdir(parents=True)
    emb = spark.read.parquet(f"{SRC_SF}/embeddings.parquet")
    n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    for c in range(CHUNKS):
        reps = [
            emb_replica(emb, k, n_emb)
            for k in range(c * REPLICAS_PER_CHUNK, (c + 1) * REPLICAS_PER_CHUNK)
        ]
        _write_chunked(reps, str(FIX / f"chunk{c}.parquet"))


def _quantized(spark, paths: list[str]):
    from pyspark.sql import functions as F

    from mapreduceproject_spark.functions.vectors import quantize, quantized_norm2

    return (
        spark.read.parquet(*paths)
        .select(F.col("vec_id").alias("_id"), quantize(F.col("embedding")).alias("_q"))
        .withColumn("_n2", quantized_norm2(F.col("_q")))
    )


def run_point(spark, n_chunks: int, label: str) -> dict:
    """Chunked dedup_embedding_cosine at n = n_chunks x 1M: sequential
    per-chunk twolevel assignment to parquet, then one in-cell stage."""
    import gc

    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators.similarity import (
        assign_cells,
        auto_centroid_count,
    )

    n = n_chunks * REPLICAS_PER_CHUNK * 2000
    c_count = auto_centroid_count(n)
    out: dict = {"n": n, "C": c_count, "chunks": n_chunks}
    assign_dir = FIX / f"assign_{label}"
    if assign_dir.exists():
        shutil.rmtree(assign_dir)

    # centroid table: seeds are ids < C, all inside chunk 0 (C << 1M)
    cents = F.broadcast(
        _quantized(spark, [str(FIX / "chunk0.parquet")])
        .filter(F.col("_id") < c_count)
        .select(
            F.col("_id").alias("cid"),
            F.col("_q").alias("cq"),
            F.col("_n2").alias("cn2"),
        )
    )

    chunk_secs = []
    for c in range(n_chunks):
        t0 = time.perf_counter()
        base = _quantized(spark, [str(FIX / f"chunk{c}.parquet")]).persist()
        assign_cells(base, cents, "_id", nprobe=NPROBE, assign="twolevel").select(
            "_id", "cid", "rn"
        ).write.mode("overwrite").parquet(str(assign_dir / f"c={c}"))
        base.unpersist()
        chunk_secs.append(round(time.perf_counter() - t0, 1))
        gc.collect()
        spark._jvm.System.gc()
    out["assign_chunk_secs"] = chunk_secs
    out["assign_total_sec"] = round(sum(chunk_secs), 1)

    # in-cell stage over the union: re-attach quantized vectors by id
    # (the same re-attach discipline assign_cells uses in-plan), then the
    # probe x primary cell join + exact cosine verify
    t0 = time.perf_counter()
    qvecs = _quantized(
        spark, [str(FIX / f"chunk{c}.parquet") for c in range(n_chunks)]
    )
    assigned = spark.read.parquet(
        *[str(assign_dir / f"c={c}") for c in range(n_chunks)]
    ).join(qvecs, "_id")
    primary = assigned.filter(F.col("rn") == 1).select(
        F.col("_id").alias("id_p"),
        F.col("_q").alias("qp"),
        F.col("_n2").alias("np2"),
        "cid",
    )
    probe = assigned.select(
        F.col("_id").alias("id_q"),
        F.col("_q").alias("qq"),
        F.col("_n2").alias("nq2"),
        "cid",
    )
    from mapreduceproject_spark.functions.vectors import prequantized_cosine

    pairs = (
        probe.join(primary, "cid")
        .filter(F.col("id_q") != F.col("id_p"))
        .select(
            F.least("id_q", "id_p").alias("id_a"),
            F.greatest("id_q", "id_p").alias("id_b"),
            prequantized_cosine(
                F.col("qq"), F.col("qp"), F.col("nq2"), F.col("np2")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= THRESHOLD)
        .distinct()
    )
    out["near_dup_pairs"] = pairs.count()
    out["incell_sec"] = round(time.perf_counter() - t0, 1)
    out["total_sec"] = round(out["assign_total_sec"] + out["incell_sec"], 1)
    shutil.rmtree(assign_dir)
    return out


def main() -> None:
    from mapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="centroid-knee", master="local[32]")
    if not FIX.exists():
        build(spark)
        print(f"# built {FIX}")
    if "--build-only" in sys.argv:
        return
    res = {
        # same-harness linear-regime baseline: n=1M -> C=8000 (n/125)
        "linear_1m": run_point(spark, 1, "1m"),
        # the knee point: n=5M -> C=16*floor(sqrt(n))=35776
        "sqrt_5m": run_point(spark, CHUNKS, "5m"),
    }
    line = json.dumps(res)
    print(line)
    merged = {}
    if ARTIFACT.exists():
        merged = json.loads(ARTIFACT.read_text())
    merged.update(res)
    ARTIFACT.write_text(json.dumps(merged, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
