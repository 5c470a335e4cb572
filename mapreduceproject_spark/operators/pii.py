"""PII detection and redaction over text columns — pure JVM expressions.

No analogue in the reference (its records are opaque text lines,
/root/reference/src/node.go:919-931); this is the data-governance tier a
training-data pipeline needs before any corpus ships: count PII surface
forms per document, then redact them with typed placeholder tags.

Design for 100 TB: everything here is `regexp_extract_all` /
`regexp_replace` column expressions — whole-stage codegen, zero shuffle,
zero Python.  The scan is embarrassingly parallel; the only data motion a
caller adds is their own rollup (e.g. per-source totals).

Pattern dialect: the patterns below restrict themselves to the syntax
subset where Java regex (Spark) and RE2 (DuckDB oracle) agree —
character classes, bounded repetition, alternation; no lookaround, no
backreferences.  Both engines scan leftmost, non-overlapping, so counts
and replacements match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement-tag) — redaction applies IN THIS ORDER, so
# the longest/most-specific pattern runs first (a 4x4 card number must be
# consumed before the 3-3-4 phone pattern could bite its tail).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("card", r"[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}", "<CARD>"),
    ("phone", r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """{name: count} of each PII pattern's matches in ``text``.

    Counts run independently on the raw text (a string can legitimately
    count under two families; redaction order, not count order, resolves
    precedence).
    """
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact(text: Column) -> Column:
    """Replace every PII match with its typed tag, most-specific first."""
    out = text
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def scan_and_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII accounting: one count column per pattern family, total,
    and the md5 of the redacted text (the cheap proof-of-redaction that
    travels instead of the text itself)."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    # project the redacted string ONCE, then derive md5 and length from
    # the materialized column: inlining redact() twice would run the
    # whole 4-pattern regexp_replace chain twice per row (CollapseProject
    # keeps multiply-referenced non-cheap aliases materialized, so the
    # two-step select is a real single evaluation)
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        redact(F.col(text_col)).alias("_redacted"),
    )
    return staged.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii"),
        F.md5(F.col("_redacted")).alias("redacted_md5"),
        F.length(F.col("_redacted")).cast("long").alias("redacted_len"),
    )


def duck_pii_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins: {name: count-expr} plus 'redacted' chained-replace
    expr (RE2 'g' flag — Spark's regexp_replace is global by default)."""
    out: dict[str, str] = {}
    red = text_expr
    for name, pat, tag in PII_PATTERNS:
        out[name] = f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    out["redacted"] = red
    return out
