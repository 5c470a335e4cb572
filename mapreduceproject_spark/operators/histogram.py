"""Equi-depth histogram operators: the exact ntile formulation (the
oracle) and the sketch-based production path.

The registered query `equidepth_histogram` (plans/analytics_queries.py)
uses an exact global-sort ntile — correct and engine-identical, but a
global sort.  At 100 TB the production shape is this module's
:func:`equidepth_approx`: one `approx_percentile` aggregate produces the
bucket bounds (a t-digest-style mergeable sketch — no global sort, one
regular shuffle-free partial+final agg), the bounds broadcast back as a
single row, and ONE more scan assigns buckets and counts them.  Two
linear passes, no sort, bounded memory.

tests/test_analytics_ops.py pins the contract: bounds monotonic,
per-bucket counts within a tolerance band of n/buckets, total preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equidepth_approx(
    df: DataFrame, col: str, buckets: int = 16, accuracy: int = 10_000
) -> DataFrame:
    """Approximate equi-depth histogram of ``col``: (bucket, n, lo, hi).

    Bucket b covers values in (bound[b-1], bound[b]] with bound[0] the
    minimum (first bucket closed below).  ``accuracy`` is Spark's
    approx_percentile knob (higher = tighter buckets, more sketch
    memory); the sketch is mergeable, so the aggregate is one ordinary
    partial+final pass — the global sort of the exact formulation never
    happens.

    NULLs are excluded: approx_percentile ignores them when building
    bounds, so counting them (they'd otherwise land silently in bucket
    1) would break the equi-depth contract.  Count them separately if
    the null rate matters — it's a data_profile column.
    """
    probs = ", ".join(str(i / buckets) for i in range(buckets + 1))
    bounds = df.agg(
        F.expr(f"approx_percentile({col}, array({probs}), {accuracy})").alias(
            "bounds"
        )
    )
    assigned = (
        df.select(F.col(col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "_v",
            # number of interior bounds strictly below the value, clamped
            # to [1, buckets]: value == a bound lands in the lower bucket
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(buckets),
                    F.aggregate(
                        F.slice(F.col("bounds"), 2, buckets - 1),
                        F.lit(1),
                        lambda acc, b: acc + F.when(F.col("_v") > b, 1).otherwise(0),
                    ),
                ),
            ).alias("bucket"),
        )
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    )
