"""Text column builders with exact DuckDB-SQL twins.

The reference's record model is whitespace-delimited text lines split by
``strings.Fields`` (/root/reference/src/node.go:919-931).  Canonical
tokenization here: split on runs of whitespace, drop empties — the sane
version of the reference protocol (its bugs — value truncation at the first
space, last-stdout-line drop — are documented divergences, SURVEY §7.4.3).

Every builder has a ``duck_*`` twin returning the equivalent DuckDB SQL so
oracle queries tokenize identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = r"\s+"


def tokens(col: Column) -> Column:
    """array<string> of whitespace-split tokens, empties removed."""
    return F.filter(F.split(col, _WS), lambda t: t != "")


def duck_tokens(expr: str) -> str:
    return rf"list_filter(string_split_regex({expr}, '\s+'), t -> t <> '')"


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles (space-joined), the minhash/jaccard unit.

    Documents shorter than k words yield a single shingle of the whole text,
    so no document silently drops out of dedup.
    """
    toks = tokens(col)
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, shingled).otherwise(F.array(F.array_join(toks, " ")))


def duck_word_shingles(expr: str, k: int = 3) -> str:
    toks = duck_tokens(expr)
    # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — zero-token docs must shingle identically
    # (caught by tests/test_properties.py, not by the fixture corpus).
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> array_to_string(({toks})[i:i+{k - 1}], ' ')) "
        f"ELSE [COALESCE(array_to_string({toks}, ' '), '')] END"
    )


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Character n-grams of a string (for fingerprinting / jaccard)."""
    length = F.length(col)
    grams = F.transform(
        F.sequence(F.lit(1), length - (n - 1)),
        lambda i: F.substring(col, i, n),
    )
    return F.when(length >= n, grams).otherwise(F.array(col))


def duck_char_ngrams(expr: str, n: int = 3) -> str:
    return (
        f"CASE WHEN length({expr}) >= {n} THEN "
        f"list_transform(range(1, length({expr}) - {n - 2}), "
        f"i -> substr({expr}, CAST(i AS INT), {n})) "
        f"ELSE [{expr}] END"
    )
