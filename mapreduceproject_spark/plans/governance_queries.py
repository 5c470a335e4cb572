"""Data-governance suite: PII scanning and redaction (operators/pii.py).

The documents fixture is PII-free word soup, so the query injects a
deterministic synthetic PII payload (derived from doc_id, identical
expression in Spark and the oracle) into a subset of documents before
scanning — the detection, counting, and redaction under test run on real
pattern machinery against known-truth text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceproject_spark.operators import pii
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table


def _augment_spark(df: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return df.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(F.lit(" contact user"), s(d), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                d % 4 == 0,
                F.concat(
                    F.lit(" host 10."), s(d % 200), F.lit(".0."), s(d % 250)
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" card 4111-1111-1111-"),
                    F.lpad(s(d % 10000), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad(s(d % 1000), 3, "0"),
                    F.lit("-"),
                    F.lpad(s(d % 10000), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ),
    )


_AUG_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         ELSE '' END
    || CASE WHEN doc_id % 4 = 0
         THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.' || CAST(doc_id % 250 AS VARCHAR)
         ELSE '' END
    || CASE WHEN doc_id % 5 = 0
         THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END
    || CASE WHEN doc_id % 7 = 0
         THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END
"""


def _pii_oracle() -> str:
    duck = pii.duck_pii_sql("aug")
    count_cols = ",\n           ".join(
        f"{duck[name]} AS n_{name}" for name, _, _ in pii.PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in pii.PII_PATTERNS)
    return f"""
    WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents),
    c AS (
      SELECT doc_id,
           {count_cols},
           md5({duck["redacted"]}) AS redacted_md5,
           CAST(length({duck["redacted"]}) AS BIGINT) AS redacted_len
      FROM a
    )
    SELECT doc_id, {", ".join(f"n_{name}" for name, _, _ in pii.PII_PATTERNS)},
           {total} AS n_pii, redacted_md5, redacted_len
    FROM c
    """


@query("pii_scan_redact", oracle=_pii_oracle())
def pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scan + typed redaction (card/phone/ipv4/email
    regex families): match counts, total, and md5-of-redacted-text — all
    whole-stage-codegen expressions, zero shuffle, the shape that scans
    100 TB at IO speed."""
    docs = _augment_spark(load_table(spark, sf_dir, "documents"))
    return pii.scan_and_redact(docs, "doc_id", "text")
