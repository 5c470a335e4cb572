"""Measure ann_pq_topk's full pipeline (train + encode + ADC score)
across vector decades on the shared 5M replica fixture
(`.scaling/gram/` — build via scripts/gram_kernel_scale.py --build-only).

What the SURVEY §8 row claims and this measures:
- training + encoding are corpus-linear (3 scans at PQ_ITERS=2: one per
  Lloyd assignment, plus the encode pass; per-scan work is n·m_sub
  sub-vector rows against broadcast codebooks);
- scoring is broadcast-LUT, exchange-free until the per-query top-k, so
  the 1M→5M step should track ~5× with the usual constant-floor
  amortization.

Methodology: gram_kernel_scale.py's harness verbatim — session warmup
(JVM + Python workers), warm min-of-2, spark.catalog.clearCache()
between runs (pq_topk itself holds no persist, but the shared harness
rule is cheap insurance).  Writes measurements/pq_scale.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
FIX = ROOT / ".scaling" / "gram"
ARTIFACT = ROOT / "measurements" / "pq_scale.json"
DIM, M_SUB, K_CODE, ITERS, TOP_K, NQ = 64, 8, 16, 2, 5, 8


def _timed(spark, fn, runs: int = 2):
    best, out = float("inf"), None
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def point(spark, n_chunks: int) -> dict:
    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators.similarity import pq_topk

    paths = [str(FIX / f"chunk{c}.parquet") for c in range(n_chunks)]
    df = spark.read.parquet(*paths)
    queries = df.where(F.col("vec_id") < NQ)

    def run():
        return pq_topk(
            df, queries, "vec_id", "embedding", "vec_id", "embedding",
            dim=DIM, m_sub=M_SUB, k_code=K_CODE, iterations=ITERS, k=TOP_K,
        ).collect()

    sec, rows = _timed(spark, run)
    return {
        "n_vectors": n_chunks * 1_000_000,
        "seconds_warm_min2": round(sec, 2),
        "rows_out": len(rows),
    }


def main() -> None:
    from mapreduceproject_spark.session import get_spark

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(128).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    if not FIX.exists():
        sys.exit("fixture missing: run scripts/gram_kernel_scale.py --build-only")

    res: dict = {"m_sub": M_SUB, "k_code": K_CODE, "iterations": ITERS}
    res["pq_1m"] = point(spark, 1)
    print("pq_1m", res["pq_1m"], flush=True)
    res["pq_5m"] = point(spark, 5)
    print("pq_5m", res["pq_5m"], flush=True)
    res["ratio_5m_over_1m"] = round(
        res["pq_5m"]["seconds_warm_min2"] / res["pq_1m"]["seconds_warm_min2"], 2
    )
    ARTIFACT.write_text(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res, indent=2), flush=True)


if __name__ == "__main__":
    main()
