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
    into output.

    Arithmetic: both terms are pmod-reduced BEFORE the add — a raw
    hash + id long addition overflows (and under ANSI mode, throws)
    whenever xxhash64 lands near Long.MAX, a per-row probability that a
    multi-billion-row input turns into a certainty.  (a%m + b%m) % m ==
    (a+b) % m, so salt values are unchanged.  Retry semantics: the
    per-row id is a nondeterministic expression, so Spark marks the map
    stage indeterminate and a fetch-failure retry rolls back the WHOLE
    stage (SPARK-25341) rather than recomputing a subset with different
    salts — partial double-counting cannot happen."""
    return df.withColumn(
        "_salt",
        F.pmod(
            F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(buckets))
            + F.pmod(F.monotonically_increasing_id(), F.lit(buckets)),
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

    ``how`` must preserve the big side's row identity (inner/left/semi/
    anti): right and full outer joins are rejected, because an unmatched
    SMALL row exists once per salt replica and would survive the outer
    join ``buckets`` times — silently inflating the small side.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"replicated_broadcast_join does not support how={how!r}: "
            f"small-side rows are replicated {buckets}x, so right/full "
            f"outer joins would duplicate unmatched small rows; use one "
            f"of {sorted(allowed)}"
        )
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
