"""Scale evidence for the round-11 two-level kNN top-k aggregate: time
the full edge build + degree histogram on a synthetic deterministic
corpus far above the sf fixtures (default 200k vectors, dim 64, auto
centroids — the kmeans_autok 100x-fixture shape), optionally with a hot
IVF cell (a constant-direction block of vectors — the skew that made the
round-10 single-level collect_list an executor-OOM shape).

Usage: python scripts/knn_topk_scale.py [N] [hot_frac_pct]
Prints one JSON line: {"n": N, "hot_pct": P, "sec": wall}.

Vectors are hash-derived (deterministic, uniform in [-0.5, 0.5]^64); the
hot block (ids in [N/2, N/2 + N·P/100) — deliberately AWAY from the
centroid seed ids < C, or the seeds themselves degenerate and every
vector collapses into cell 0) shares one direction plus a tiny
id-dependent perturbation, so those vectors land in one cell and the
per-src candidate lists there are ~hot-block-sized.  NOTE the pair stage
is quadratic in the cell BY DESIGN (Σ cell²) — keep N·P/100 in the few
thousands; the two-level aggregate bounds the top-k MEMORY, not the
scoring compute.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators.graph import (
        degree_histogram,
        knn_edges_ivf,
    )
    from mapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="knn_topk_scale", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    dim = 64
    uniform = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.col("id") * dim + d), F.lit(1000)).cast("double")
            / 1000.0
            - 0.5
        ),
    )
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.when(d == 0, F.lit(1.0)).otherwise(
            (F.col("id") % 97).cast("double") * 1e-6 * (d.cast("double") + 1.0)
        ),
    )
    lo, hi = n // 2, n // 2 + int(n * hot_pct / 100)
    vec = (
        F.when((F.col("id") >= lo) & (F.col("id") < hi), hot).otherwise(uniform)
        if hot_pct
        else uniform
    )
    emb = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))

    t0 = time.perf_counter()
    degree_histogram(
        knn_edges_ivf(emb, "vec_id", "embedding", num_centroids="auto", k=4)
    ).write.format("noop").mode("overwrite").save()
    sec = round(time.perf_counter() - t0, 2)
    print(json.dumps({"n": n, "hot_pct": hot_pct, "sec": sec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
