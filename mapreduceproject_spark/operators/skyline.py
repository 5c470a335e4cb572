"""2-D skyline (Pareto frontier) operators.

No reference analogue (its reducers are counters); this is the
multi-criteria ranking primitive — "cheapest for its size" — that
optimizer research calls the skyline query.

Two formulations:

- :func:`skyline_2d` — ONE sorted window pass: order by (x asc, y desc,
  tiebreak), keep rows whose y beats the running max over everything
  cheaper.  Exact, but the sort is global.
- :func:`skyline_2d_two_phase` — the 100 TB shape: per-bucket local
  frontiers first (any hash bucketing works — dominance within a bucket
  is necessary for global dominance... the converse: a row dominated in
  its bucket can never be on the global frontier, so local pruning is
  LOSSLESS), then the global single pass over the union of survivors.
  Frontiers are tiny in practice (O(log n) expected for independent
  dimensions), so the global pass runs over a vanishing fraction of the
  input and the heavy work is embarrassingly parallel.

Both return the same frontier; tests/test_analytics_ops.py proves
equality on the fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _frontier(df: DataFrame, x: str, y: str, tiebreak: list[str], *, part: list[str] | None = None) -> DataFrame:
    """Rows not dominated (strictly better y among ≤ x) within each
    ``part`` group (global when ``part`` is None)."""
    cols = part or []
    # explicit nulls-LAST: Spark's bare asc() sorts NULLs FIRST, so a
    # NULL-x row would be "kept" as the leading frontier row and its y
    # would suppress every genuine frontier point — and DuckDB's default
    # ORDER BY puts NULLs last, so the engines would also disagree.
    w = (
        Window.partitionBy(*cols)
        .orderBy(
            F.asc_nulls_last(x),
            F.desc(y),
            *[F.asc_nulls_last(c) for c in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    best_prev = F.max(y).over(w)
    return (
        df.withColumn("_sk_best", best_prev)
        .filter(F.col("_sk_best").isNull() | (F.col(y) > F.col("_sk_best")))
        .drop("_sk_best")
    )


def skyline_2d(df: DataFrame, x: str, y: str, tiebreak: list[str]) -> DataFrame:
    """Exact 2-D skyline in one global sorted pass (minimize x, maximize
    y).  The sort carries only the projected columns — use on inputs
    that fit a global sort of (x, y, tiebreak) tuples.

    Duplicate-point semantics: rows sharing an exact frontier (x, y)
    keep ONE representative (lowest tiebreak) — the strict
    `y > running max` comparison drops the rest.  Classical skyline
    definitions keep all mutually non-dominating duplicates; the
    randomized cross-check in tests/test_analytics_ops.py pins that the
    frontier *coordinates* match the O(n²) definition exactly and the
    representatives are a subset of it."""
    return _frontier(df, x, y, tiebreak)


def skyline_2d_two_phase(
    df: DataFrame, x: str, y: str, tiebreak: list[str], buckets: int = 32, bucket_on: Column | None = None
) -> DataFrame:
    """Scale formulation: local frontier per hash bucket (lossless
    pruning — a locally dominated row is globally dominated by the same
    witness), then the exact global pass over the surviving sliver.

    ``buckets`` is the parallelism knob; ``bucket_on`` defaults to a
    hash of the tiebreak columns (any assignment is correct — bucketing
    only affects how much phase 1 prunes, never the result).
    """
    key = bucket_on if bucket_on is not None else F.xxhash64(*[F.col(c) for c in tiebreak])
    local = _frontier(
        df.withColumn("_sk_b", F.pmod(key, F.lit(buckets))),
        x,
        y,
        tiebreak,
        part=["_sk_b"],
    ).drop("_sk_b")
    return _frontier(local, x, y, tiebreak)
