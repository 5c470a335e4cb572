"""Vector math over array<float> embedding columns — JVM-side only.

Dot products / norms are expressed with ``zip_with`` + ``aggregate`` so they
run inside whole-stage codegen (no Python boundary).  Everything computes in
double; the DuckDB twins cast to DOUBLE[] so both engines sum the same
values in the same element order → bit-comparable results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def duck_cosine(a_expr: str, b_expr: str) -> str:
    """DuckDB twin: same sequential-order double-precision cosine."""
    return (
        f"(list_aggregate(list_transform(range(1, len({a_expr})+1), "
        f"i -> CAST(({a_expr})[i] AS DOUBLE) * CAST(({b_expr})[i] AS DOUBLE)), 'sum')"
        f" / (sqrt(list_aggregate(list_transform({a_expr}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
        f" * sqrt(list_aggregate(list_transform({b_expr}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))))"
    )
