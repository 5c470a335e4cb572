"""Content-defined chunking (CDC) and chunk-level deduplication.

The reference dedups nothing (files are opaque blobs re-replicated whole,
/root/reference/src/master_helpers.go:103-139); chunk-level dedup is the
storage/corpus technique its design would need at scale, so it joins the
dedup tier as a first-class operator.

Word-level gear-style CDC: a token ends its chunk when
``hash60(token) % avg_len == 0``.  Because the cut decision depends only
on content at the cut point, an edit resynchronizes within one chunk —
the shift-resistance that fixed-width spans (dedup_span_exact's unit)
fundamentally lack, and the reason real pipelines (LBFS, restic, Borg)
chunk this way.

Scale shape: one posexplode (linear), one window prefix-sum keyed by
document id, one groupBy (doc, chunk) to assemble chunks, one window
keyed by chunk hash to pick global first-occurrences, one rollup.  Every
shuffle key is either the doc id or the chunk hash — both high-cardinality
and skew-free; nothing is quadratic in anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.hashing import hash60
from mapreduceproject_spark.functions.textfn import token_rows

CDC_AVG_TOKENS = 16  # expected chunk length: 1/16 cut probability per token


def cdc_chunk_rows(
    df: DataFrame, id_col: str, text_col: str, keep: list[str] | None = None
) -> DataFrame:
    """One row per content-defined chunk:
    (id, keep..., chunk_idx, chunk_hash, n_tokens).

    Chunk text is assembled order-exactly (array_sort over (pos, tok)
    structs — collect_list alone has no ordering guarantee after a
    shuffle) and travels only as its hash60.
    """
    keep = keep or []
    toks = token_rows(
        df.select(id_col, text_col, *keep), F.lower(F.col(text_col)), [id_col, *keep]
    )
    cut = (hash60(F.col("tok")) % CDC_AVG_TOKENS == 0).cast("long")
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_chunk = toks.withColumn(
        "chunk_idx", F.coalesce(F.sum(cut).over(w_prev), F.lit(0)).cast("long")
    )
    return (
        with_chunk.groupBy(id_col, *keep, "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("_chunk_text"),
            F.count("*").cast("long").alias("n_tokens"),
        )
        .select(
            id_col,
            *keep,
            "chunk_idx",
            hash60(F.col("_chunk_text")).alias("chunk_hash"),
            "n_tokens",
        )
    )


def chunk_dup_rollup(
    chunks: DataFrame, id_col: str, group_col: str
) -> DataFrame:
    """Per-group chunk dedup accounting: total chunks, distinct chunk
    hashes, duplicate occurrences (any occurrence that is not the global
    first for its hash — ordered by (id, chunk_idx), deterministic), and
    the token volume those duplicates would save."""
    w = Window.partitionBy("chunk_hash").orderBy(F.col(id_col), F.col("chunk_idx"))
    ranked = chunks.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_distinct_chunks"),
            F.sum((F.col("_rn") > 1).cast("long")).alias("n_dup_occurrences"),
            F.sum(F.when(F.col("_rn") > 1, F.col("n_tokens")).otherwise(0)).alias(
                "dup_tokens"
            ),
        )
        .orderBy(group_col)
    )


# ---------------------------------------------------------------------------
# sliding token windows (pretraining / RAG context chunking)
# ---------------------------------------------------------------------------

def sliding_token_windows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-size overlapping token windows — the context-window chunking
    every pretraining/RAG pipeline runs before packing or embedding.

    One row per (doc, window): windows of ``window`` tokens starting
    every ``stride`` tokens (overlap = window - stride), trailing runt
    window kept.  Output: (doc_id, chunk_idx, chunk_start, n_tokens,
    chunk_hash) with chunk_hash = hash60 of the space-joined window —
    feed it to exact_dedup_groups for chunk-level dedup or to an
    embedding kernel for retrieval indexing.

    Scale: strictly scan-shaped — tokenize + one generator expression per
    row, zero shuffles; output is ~n_tokens/stride rows per document.
    The token array lives once per row in the Generate, never per
    window (the slice indexes into it lazily).
    """
    from mapreduceproject_spark.functions.textfn import tokens

    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select("doc_id", F.posexplode(starts).alias("chunk_idx", "chunk_start"), "_toks")
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.slice(F.col("_toks"), F.col("chunk_start") + 1, window).alias("_w"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.size("_w").cast("long").alias("n_tokens"),
            hash60(F.concat_ws(" ", F.col("_w"))).alias("chunk_hash"),
        )
    )
