"""Shared exact-integer OLS sufficient statistics.

One implementation of the closed-form simple-regression algebra used by
``grouped_regression`` (plans/stats_queries.py) and ``token_zipf_fit``
(plans/analytics_queries.py), in both dialects — Spark Column
expressions and the DuckDB oracle SQL fragment — so the two queries
cannot drift and an overflow fix lands in every copy at once.

Contract: inputs are pre-quantized int64 columns ``x`` and ``y``; the
caller is responsible for the magnitude audit (every product below must
stay under 2^63: n·Σxy, Σx·Σy, n·Σx², (Σx)², n·Σy², (Σy)²).  The sums
are exact 64-bit integers — order-independent, bit-identical across
engines — and doubles appear only in the final slope/intercept/r²
expressions, evaluated identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OLS_SUM_NAMES = ("n", "sx", "sy", "sxy", "sxx", "syy")


def ols_sum_aggs() -> list[Column]:
    """Aggregate expressions producing the six sufficient statistics from
    int64 columns ``x`` and ``y`` (aliases in OLS_SUM_NAMES order)."""
    return [
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    ]


def ols_outputs() -> tuple[Column, Column, Column]:
    """(slope_q, intercept_q, r2) over the OLS_SUM_NAMES columns.

    slope_q / intercept_q are in quantized-y-per-quantized-x units — the
    caller rescales by its own quantization factors (slope is invariant
    when x and y share one scale).
    """
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # nullif denominators: a single-row or constant-x group has zero x
    # variance and no defined slope — NULL on both engines (the DuckDB
    # twins NULLIF identically), where Spark ANSI would otherwise raise
    # DIVIDE_BY_ZERO and kill the whole grouped regression.
    slope_q = num / F.nullif(denx, F.lit(0.0))
    intercept_q = (
        F.col("sy").cast("double") / F.col("n") - slope_q * F.col("sx") / F.col("n")
    )
    r2 = num * num / F.nullif(denx * deny, F.lit(0.0))
    return slope_q, intercept_q, r2


def duck_ols_sums(from_clause: str, group_by: str | None = None) -> str:
    """DuckDB subquery computing the six sums from a relation exposing
    int64 ``x`` and ``y`` (plus the group column when ``group_by``)."""
    g = f"{group_by}, " if group_by else ""
    tail = f" GROUP BY {group_by}" if group_by else ""
    return (
        f"(SELECT {g}CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,"
        " CAST(SUM(x * y) AS BIGINT) AS sxy,"
        " CAST(SUM(x * x) AS BIGINT) AS sxx,"
        " CAST(SUM(y * y) AS BIGINT) AS syy"
        f" FROM {from_clause}{tail})"
    )


DUCK_OLS_NUM = "CAST(n * sxy - sx * sy AS DOUBLE)"
DUCK_OLS_DENX = "CAST(n * sxx - sx * sx AS DOUBLE)"
DUCK_OLS_DENY = "CAST(n * syy - sy * sy AS DOUBLE)"
# NULLIF mirrors ols_outputs' zero-variance guard (degenerate group ->
# NULL slope/r2 on both engines)
DUCK_OLS_SLOPE_Q = f"{DUCK_OLS_NUM} / NULLIF({DUCK_OLS_DENX}, 0)"
DUCK_OLS_INTERCEPT_Q = (
    f"(CAST(sy AS DOUBLE) / n - ({DUCK_OLS_SLOPE_Q}) * sx / n)"
)
DUCK_OLS_R2 = (
    f"{DUCK_OLS_NUM} * {DUCK_OLS_NUM}"
    f" / NULLIF({DUCK_OLS_DENX} * {DUCK_OLS_DENY}, 0)"
)
