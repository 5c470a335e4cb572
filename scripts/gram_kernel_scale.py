"""Measure the Gram-kernel redundant-dims plan across vector decades.

embedding_redundant_dims' SURVEY §8 row claims two scale properties for
operators/similarity.py::dim_correlation_top:

1. **Linear in n**: one Arrow pass over the corpus; everything after the
   kernel is P·O(D²) partial rows (independent of n).  Measured here at
   n = 1M and n = 5M — the ratio should track 5× (same box, same D).
2. **The avoided plan is row-scaled**: the declarative alternative
   (posexplode each vector to D(D-1)/2 pair rows, groupBy (i, j)) shuffles
   n·2016 rows at D = 64.  Measured here at n = 100k (2·10⁸ exploded rows
   — already minutes) against the kernel at the same n, quantifying the
   gap without paying the 1M-point naive run (2·10⁹ rows).

Fixture: `.scaling/gram/chunk<c>.parquet`, c = 0..4 — 1M vectors per
chunk, replicas [500c, 500(c+1)) of the sf0.1 embeddings under
scaling_run.emb_replica (norm-preserving rotations/flips, so the
|q| < 2²² int64-exactness envelope of the kernel is untouched).

Methodology (the SCALING.md house convention): warm min-of-2 within one
session; run on a quiet box.  Each timed point calls .collect() on the
full query (20 rows out).

Usage:
  python scripts/gram_kernel_scale.py --build-only   # fixture only
  python scripts/gram_kernel_scale.py                # build if absent, run
Writes measurements/gram_kernel_scale.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

CHUNKS = 5
REPLICAS_PER_CHUNK = 500
SRC_SF = "/root/testdata/sf0.1"
ROOT = Path(__file__).resolve().parent.parent
FIX = ROOT / ".scaling" / "gram"
ARTIFACT = ROOT / "measurements" / "gram_kernel_scale.json"
DIM, TOP_K = 64, 20
NAIVE_N = 100_000  # vectors fed to the posexplode-pair baseline


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


def _timed(spark, fn, runs: int = 2) -> tuple[float, object]:
    """Warm min-of-N with the SPARK cache cleared before every run:
    dim_correlation_top persists its moments table internally, and
    Spark's CacheManager matches rebuilt identical plans to the live
    cache entry — without clearCache() run 2 would time a 2145-row
    cache read (0.24 s at n=5M) instead of the corpus kernel (44.9 s).
    What stays warm across runs — deliberately — is the JVM, the Python
    workers, and the OS page cache holding the parquet bytes."""
    best, out = float("inf"), None
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def kernel_point(spark, n_chunks: int) -> dict:
    from mapreduceproject_spark.operators.similarity import dim_correlation_top

    paths = [str(FIX / f"chunk{c}.parquet") for c in range(n_chunks)]
    df = spark.read.parquet(*paths)
    sec, rows = _timed(
        spark, lambda: dim_correlation_top(df, "embedding", DIM, TOP_K).collect()
    )
    return {
        "n_vectors": n_chunks * REPLICAS_PER_CHUNK * 2000,
        "seconds_warm_min2": round(sec, 2),
        "rows_out": len(rows),
        "top_abs_corr": round(max(abs(r["corr"]) for r in rows), 6) if rows else None,
    }


def naive_point(spark, n_vectors: int) -> dict:
    """The posexplode-pair plan the kernel exists to avoid: quantize,
    posexplode to D components, self-join components per row id into
    i<j pairs, groupBy (i, j) with decimal sums — semantically the same
    moments, row-scaled shuffle (n·D(D-1)/2 rows pre-aggregate)."""
    from pyspark.sql import functions as F

    from mapreduceproject_spark.functions.vectors import quantize

    df = (
        spark.read.parquet(str(FIX / "chunk0.parquet"))
        .where(F.col("vec_id") < n_vectors)
        .select(F.col("vec_id"), quantize(F.col("embedding")).alias("q"))
    )
    comp = df.select(
        "vec_id", F.posexplode("q").alias("d", "qd")
    )

    def run():
        a = comp.alias("a")
        b = comp.alias("b")
        pairs = (
            a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.d") < F.col("b.d")))
            .groupBy(F.col("a.d").alias("i"), F.col("b.d").alias("j"))
            .agg(
                F.sum(
                    (F.col("a.qd") * F.col("b.qd")).cast("decimal(38,0)")
                ).alias("g")
            )
        )
        return pairs.count()

    sec, n_groups = _timed(spark, run, runs=1)  # single pass — the SLOW arm
    return {
        "n_vectors": n_vectors,
        "seconds_cold1": round(sec, 2),
        "pair_groups": n_groups,
    }


def main() -> None:
    from mapreduceproject_spark.session import get_spark

    spark = get_spark()
    # bench.py's session warmup: JVM + codegen + one tiny mapInPandas
    # round-trip so N-worker Python startup (a session-wide one-time
    # cost) isn't billed to whichever timed point runs first — without
    # it the first point swings 3x between runs (measured 2.97 s vs
    # 10.55 s for the same 100k kernel)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(128).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    if not FIX.exists():
        print("building fixture ...", flush=True)
        t0 = time.monotonic()
        build(spark)
        print(f"fixture built in {time.monotonic() - t0:.0f}s", flush=True)
    if "--build-only" in sys.argv:
        return

    res: dict = {"dim": DIM, "top_k": TOP_K}
    # kernel at the naive arm's n first (same-n comparison), then decades
    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators.similarity import dim_correlation_top

    # filter, NOT limit: GlobalLimit collapses the upstream kernel to a
    # single task (measured 11.4 s for 100k vs 6.85 s for the full 1M);
    # chunk0's vec_ids are contiguous 0..999999, so a predicate keeps
    # the scan partition-parallel at the reduced n
    small = spark.read.parquet(str(FIX / "chunk0.parquet")).where(
        F.col("vec_id") < NAIVE_N
    )
    sec, rows = _timed(
        spark, lambda: dim_correlation_top(small, "embedding", DIM, TOP_K).collect()
    )
    res["kernel_100k"] = {
        "n_vectors": NAIVE_N,
        "seconds_warm_min2": round(sec, 2),
        "rows_out": len(rows),
    }
    print("kernel_100k", res["kernel_100k"], flush=True)

    res["naive_100k"] = naive_point(spark, NAIVE_N)
    print("naive_100k", res["naive_100k"], flush=True)

    # second naive point: at 100k the naive plan hides behind map-side
    # partial aggregation (its 2·10⁸ joined pair rows collapse to 2016
    # groups before the shuffle) — what grows is the self-join's n·2D-row
    # exchange + the n·D²/2 join-output work, so the decade step exposes it
    res["naive_1m"] = naive_point(spark, 10 * NAIVE_N)
    print("naive_1m", res["naive_1m"], flush=True)

    res["kernel_1m"] = kernel_point(spark, 1)
    print("kernel_1m", res["kernel_1m"], flush=True)

    res["kernel_5m"] = kernel_point(spark, CHUNKS)
    print("kernel_5m", res["kernel_5m"], flush=True)

    res["ratio_5m_over_1m"] = round(
        res["kernel_5m"]["seconds_warm_min2"] / res["kernel_1m"]["seconds_warm_min2"], 2
    )
    res["naive_over_kernel_100k"] = round(
        res["naive_100k"]["seconds_cold1"] / res["kernel_100k"]["seconds_warm_min2"], 1
    )
    ARTIFACT.write_text(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res, indent=2), flush=True)


if __name__ == "__main__":
    main()
