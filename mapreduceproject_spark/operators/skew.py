"""Skew-mitigation helpers: salting for hot keys.

AQE's skew-join splitting (on in session.py) is the first line of defense;
these helpers are the explicit pattern for the cases AQE can't fix:
a holistic aggregation where one key owns a huge fraction of rows, and a
shuffle join against a key distribution too skewed for split-and-replicate
heuristics.  The reference has the same problem in miniature — one
`prefix_key` file per distinct key means its hottest key serializes into a
single reducer (/root/reference/src/juice_helpers.go:286-316) with no
remedy at all.

Both helpers keep results exactly equal to their unsalted equivalents
(tests/test_skew.py proves it); salt values are internal and never leak
into output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_cols: list[str], buckets: int) -> DataFrame:
    """Salt in [0, buckets): content hash of non-key columns mixed with a
    per-row id.  The per-row component matters for the classic skew case —
    all-identical spam rows under one hot key — where any pure content
    hash maps every duplicate to ONE bucket and the mitigation silently
    degenerates to unsalted.  Downstream results are salt-invariant (the
    two-stage agg sums partials; the replicated join carries every small
    row in every bucket), so the nondeterministic component never leaks
    into output."""
    return df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in from_cols])
            + F.monotonically_increasing_id(),
            F.lit(buckets),
        ),
    )


def salted_count(
    df: DataFrame, keys: list[str], salt_from: list[str], buckets: int = 16
) -> DataFrame:
    """Two-stage count: groupBy(keys+salt) then groupBy(keys).

    Stage 1 spreads a hot key over ``buckets`` reducers; stage 2 combines
    ``buckets`` tiny partials per key.  Output identical to a plain
    ``groupBy(keys).count()``.
    """
    partial = (
        with_salt(df, salt_from, buckets)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))


def replicated_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's keys, replicate the small
    side once per salt bucket, join on (keys, salt).

    Each hot-key partition of ``big`` lands on ``buckets`` different
    reducers, each holding a full copy of the matching ``small`` rows —
    the standard salted-join pattern when the small side is broadcastable
    but the big side's key histogram is too skewed for a plain shuffle.
    """
    salted_big = with_salt(big, big.columns, buckets)
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    out = salted_big.join(F.broadcast(replicated), [*on, "_salt"], how)
    return out.drop("_salt")


def skew_report(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the hottest
    keys — what you run before choosing buckets."""
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(*keys, "n", (F.col("n") / F.col("_t")).alias("share"))
        .orderBy(F.desc("n"), *keys)
        .limit(top)
    )
