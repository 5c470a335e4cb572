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
    # nullif denominator: a zero vector has no direction — cosine is NULL
    # on BOTH engines instead of an ANSI DIVIDE_BY_ZERO abort (Spark 4
    # raises even on double/0; the DuckDB twins NULLIF identically).
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


QUANT_SCALE = 1_000_000


def quantize(col: Column) -> Column:
    """array<long>: floor(x * 1e6) per element.

    Floor (unlike round) has no half-way ambiguity, so two engines seeing
    the same doubles produce the same integers.  64-dim dots of ±1e6 ints
    stay < 2^63 with lots of headroom (no ANSI overflow).
    """
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT_SCALE).cast("long"))


def quantized_cosine(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors: integer sums are exact and
    order-independent, so the final double is bit-identical on every
    engine — the determinism workhorse for embedding queries."""
    qa, qb = quantize(a), quantize(b)
    d = F.aggregate(F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)
    na = F.aggregate(qa, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    nb = F.aggregate(qb, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    # nullif: an all-zero (or all-sub-1e-6) vector quantizes to zero norm;
    # NULL cosine on both engines, never an ANSI DIVIDE_BY_ZERO abort
    return d.cast("double") / F.nullif(
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")), F.lit(0.0)
    )


def quantized_norm2(q: Column) -> Column:
    """Σ qᵢ² (long) over an already-quantized array."""
    return F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x * x)


def prequantized_cosine(qa: Column, qb: Column, na2: Column, nb2: Column) -> Column:
    """:func:`quantized_cosine` for pre-quantized arrays with precomputed
    squared norms — identical arithmetic (same sums, same order, same
    final division) so the result is bit-identical, but a candidate-pair
    join that scores millions of pairs quantizes each vector ONCE
    upstream instead of twice per pair, and skips both per-pair norm
    aggregations."""
    d = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.cast("double") / F.nullif(
        F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double")), F.lit(0.0)
    )


def duck_quantize(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"


def duck_quantized_cosine(qa: str, qb: str) -> str:
    """DuckDB twin of :func:`quantized_cosine`; ``qa``/``qb`` must already
    be quantized BIGINT[] expressions (quantize once in a CTE, reuse).

    Two alignment guards mirror the Spark side exactly: NULLIF on the
    denominator (zero-norm vector → NULL cosine, where Spark ANSI would
    otherwise raise and bare DuckDB would return NULL unilaterally), and
    a length-equality CASE — Spark's zip_with NULL-pads the shorter
    array and the sum NULL-poisons, while DuckDB's 'sum' SKIPS the NULL
    products from out-of-range indexing and would silently return a
    partial dot over the common prefix."""
    dot = (
        f"list_aggregate(list_transform(range(1, len({qa})+1), i -> ({qa})[i] * ({qb})[i]), 'sum')"
    )
    na = f"list_aggregate(list_transform({qa}, x -> x * x), 'sum')"
    nb = f"list_aggregate(list_transform({qb}, x -> x * x), 'sum')"
    return (
        f"(CASE WHEN len({qa}) = len({qb}) THEN"
        f" CAST({dot} AS DOUBLE)"
        f" / NULLIF(sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)), 0)"
        f" END)"
    )


def duck_cosine(a_expr: str, b_expr: str) -> str:
    """DuckDB twin: same sequential-order double-precision cosine (same
    zero-norm NULLIF guard as the Spark side)."""
    return (
        f"(list_aggregate(list_transform(range(1, len({a_expr})+1), "
        f"i -> CAST(({a_expr})[i] AS DOUBLE) * CAST(({b_expr})[i] AS DOUBLE)), 'sum')"
        f" / NULLIF(sqrt(list_aggregate(list_transform({a_expr}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
        f" * sqrt(list_aggregate(list_transform({b_expr}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 0))"
    )
