"""SQL function registration: the engine's portable primitives exposed to
``spark.sql`` users.

The reference's only extension point is "bring an executable"
(/root/reference/src/node.go:916); here a SQL user gets the same
deterministic primitives the DataFrame operators use.  They are declared
as Spark SQL UDFs (``CREATE FUNCTION ... RETURN <expression>``) — pure
Catalyst expressions, so they inline into whole-stage codegen; no Python
UDF boundary, no per-row serialization.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mapreduceproject_spark.functions.vectors import QUANT_SCALE

_DEFS: dict[str, str] = {
    # md5-derived 60-bit hash — the cross-engine determinism primitive
    "hash60": """
        (s STRING) RETURNS BIGINT
        RETURN CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    """,
    # whitespace tokens, empties dropped (the sane reference protocol)
    "ws_tokens": r"""
        (s STRING) RETURNS ARRAY<STRING>
        RETURN filter(split(s, '\\s+'), t -> t != '')
    """,
    # k-char ngrams (k fixed at 3 for the SQL surface)
    "char_ngrams3": """
        (s STRING) RETURNS ARRAY<STRING>
        RETURN CASE WHEN length(s) >= 3
               THEN transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))
               ELSE array(s) END
    """,
    # engine-exact cosine over quantized integer vectors
    "qcosine": f"""
        (a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN (
          WITH q AS (SELECT
            transform(a, x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT)) AS qa,
            transform(b, x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT)) AS qb)
          SELECT CAST(aggregate(zip_with(qa, qb, (x, y) -> x * y),
                                CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE)
               / nullif(sqrt(CAST(aggregate(qa, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS DOUBLE))
                  * sqrt(CAST(aggregate(qb, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS DOUBLE)), 0.0d)
          FROM q)
    """,
}


def register_sql_functions(spark: SparkSession) -> None:
    """Declare the engine's SQL UDFs (idempotent, session-scoped)."""
    for name, body in _DEFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
