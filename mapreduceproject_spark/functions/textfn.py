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

# One whitespace class BOTH regex dialects read identically: Java's \s is
# [ \t\n\x0B\f\r] but RE2's \s omits \x0B (vertical tab), so a literal
# \s in twinned patterns silently diverges on VT-containing text
# (verified live: Spark splits 'foo\x0bbar', DuckDB does not).  Python's
# str.split() is Unicode-whitespace (NBSP, NEL, ...) and must not be used
# as a twin either — WORDCOUNT semantics route through this class too.
WS_CHARS = r" \t\n\x0B\f\r"
WS_CLASS = f"[{WS_CHARS}]"
_WS = WS_CLASS + "+"


def tokens(col: Column) -> Column:
    """array<string> of whitespace-split tokens, empties removed.

    NULL text coalesces to '' (an empty token array) on BOTH engines —
    without it a NULL-text document tokenizes to NULL here but the
    DuckDB twins' COALESCE-on-join paths see '', and the document
    silently diverges between the engines (dropped from Spark joins,
    bucketed as empty in the oracle)."""
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), _WS), lambda t: t != ""
    )


def duck_tokens(expr: str) -> str:
    return (
        rf"list_filter(string_split_regex(COALESCE({expr}, ''), '{_WS}'),"
        rf" t -> t <> '')"
    )


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


def char_ngram_rows(
    df,
    text: Column,
    n: int,
    keep: list[str],
    gram_col: str = "g",
    pos_col: str | None = None,
):
    """One row per character n-gram — the linear-time formulation.

    ``explode(char_ngrams(lower(text)))`` looks equivalent but is O(len²)
    per document: Catalyst inlines the computed string expression into the
    transform lambda, so ``lower(text)`` re-evaluates for every gram index
    (the same plan pathology that made winnowing non-terminating; see
    SCALING.md).  Here the string is projected once per row, gram *start
    positions* are exploded, and ``substring`` runs on the materialized
    column — one O(n) pass.  Emits exactly ``char_ngrams`` semantics:
    documents shorter than ``n`` yield one gram of the whole string.

    ``pos_col``, when set, carries the 0-based gram position (matching
    ``posexplode`` numbering).
    """
    base = df.select(*keep, text.alias("_cgr_txt")).select(
        *keep,
        "_cgr_txt",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("_cgr_txt") - (n - 1), F.lit(1))
            )
        ).alias("_cgr_i"),
    )
    out_cols = list(keep)
    if pos_col is not None:
        out_cols.append((F.col("_cgr_i") - 1).alias(pos_col))
    return base.select(
        *out_cols, F.expr(f"substring(_cgr_txt, _cgr_i, {n})").alias(gram_col)
    )


def word_shingle_rows(
    df, text: Column, k: int, keep: list[str], shingle_col: str = "sh"
):
    """One row per k-word shingle — linear-time twin of ``word_shingles``.

    The array version's ``array_join(slice(toks, i, k))`` lambda inlines
    the computed token array per shingle index (O(words²) per document —
    see :func:`char_ngram_rows`).  Here tokens are posexploded once and
    shingles assembled from ``lead()`` over a per-document window: one
    shuffle on the id, linear work, and no per-row array duplication even
    for very long documents.  Semantics match exactly, including the
    short-document rule (< k words → one shingle of the whole text).
    """
    from pyspark.sql import Window

    base = df.select(*keep, tokens(text).alias("_wsh_toks"))
    n = F.coalesce(F.size("_wsh_toks"), F.lit(-1))
    w = Window.partitionBy(*keep).orderBy("_wsh_i")
    parts = [F.col("_wsh_t")] + [F.lead("_wsh_t", j).over(w) for j in range(1, k)]
    long_sh = (
        base.filter(n >= k)
        .select(*keep, F.posexplode("_wsh_toks").alias("_wsh_i", "_wsh_t"))
        .select(
            *keep,
            F.concat_ws(" ", *parts).alias(shingle_col),
            F.lead("_wsh_i", k - 1).over(w).alias("_wsh_end"),
        )
        .filter(F.col("_wsh_end").isNotNull())
        .drop("_wsh_end")
    )
    short_sh = base.filter(n < k).select(
        *keep, F.array_join("_wsh_toks", " ").alias(shingle_col)
    )
    return long_sh.unionByName(short_sh)


def token_rows(df, text: Column, keep: list[str], tok_col: str = "tok", pos_col: str = "pos"):
    """One row per whitespace token with its 1-based position.

    The token array is projected into a materialized column first, then
    posexploded — the same two-step that keeps :func:`char_ngram_rows`
    linear (a lambda indexing a *computed* array re-evaluates the inner
    expression per element; a posexplode of a projected column does not).
    """
    return (
        df.select(*keep, tokens(text).alias("_tr_toks"))
        .select(*keep, F.posexplode("_tr_toks").alias("_tr_i", tok_col))
        .select(*keep, (F.col("_tr_i") + 1).alias(pos_col), tok_col)
    )


def duck_token_rows(expr: str, keep: str, from_clause: str = "documents") -> str:
    """DuckDB twin of :func:`token_rows`: subquery yielding
    (keep..., pos, tok) — carry the token list through an unnest of its
    index range, then index it (DuckDB's lateral-unnest-in-SELECT idiom)."""
    toks = duck_tokens(expr)
    return (
        f"(SELECT {keep}, CAST(pos AS BIGINT) AS pos, t[CAST(pos AS INT)] AS tok FROM "
        f"(SELECT {keep}, t, unnest(range(1, len(t)+1)) AS pos FROM "
        f"(SELECT {keep}, {toks} AS t FROM {from_clause})))"
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
