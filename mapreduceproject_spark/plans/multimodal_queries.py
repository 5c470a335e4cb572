"""Multimodal suite: binary payloads + typed metadata processed through
Arrow-batched mapInPandas (operators/multimodal.py).

The payload is the utf-8 encoding of ``documents.text`` (fixtures carry no
real media; corpus is ASCII so byte offsets == char offsets), which lets
every md5-derived fake kernel be replicated exactly in DuckDB SQL — the
Spark side still exercises the full binary/mapInPandas machinery.

NULL text normalizes to '' on BOTH sides (attach_binary_payload
coalesces before encoding; every oracle reads through a
COALESCE(text, '') subquery) so a NULL-text document flows through the
Arrow kernels as an empty payload instead of a TypeError on one engine
and a NULL row on the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduceproject_spark.operators import multimodal as mm
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table


def _payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.attach_binary_payload(docs, "doc_id", "text")


@query(
    "mm_decode_stats",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(list_aggregate(list_transform(range(1,16), i ->
                 (strpos('0123456789abcdef', substr(substr(md5(text),1,15), CAST(i AS INT), 1)) - 1)::BIGINT
                 << ((15-i)*4)::INT), 'sum') % 256 AS BIGINT) AS mean_pixel
    FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents) d
    """,
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake image decode: per-payload byte count, content
    md5, hash-derived 'mean pixel'."""
    return mm.decode_stats(_payload(spark, sf_dir), "doc_id")


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text, (length(text) % 10) + 1 AS nf FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents) d
    )
    SELECT doc_id,
           CAST(fi AS BIGINT) AS frame_idx,
           md5(text || ':' || CAST(fi AS VARCHAR)) AS frame_md5
    FROM (SELECT doc_id, text, unnest(range(0, nf, {mm.FRAME_STRIDE})) AS fi FROM v)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every {FRAME_STRIDE}nd frame of n_frames
    (from media_meta), variable-row fan-out through mapInPandas."""
    return mm.frame_sample(_payload(spark, sf_dir), "doc_id")


@query(
    "mm_audio_chunks",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text,
             CAST(ceil(strlen(text) / {mm.CHUNK_BYTES}.0) AS BIGINT) AS nchunks
      FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents) d
    )
    SELECT doc_id,
           CAST(ci AS BIGINT) AS chunk_idx,
           CAST(least({mm.CHUNK_BYTES}, strlen(text) - ci * {mm.CHUNK_BYTES}) AS BIGINT) AS chunk_bytes,
           md5(substr(text, CAST(ci * {mm.CHUNK_BYTES} + 1 AS INT), {mm.CHUNK_BYTES})) AS chunk_md5
    FROM (SELECT doc_id, text, unnest(range(0, nchunks)) AS ci FROM v)
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style fixed-{CHUNK_BYTES}-byte chunking with per-chunk md5."""
    return mm.audio_chunks(_payload(spark, sf_dir), "doc_id")


@query(
    "mm_feature_extract",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS dim,
           CAST(list_aggregate(list_transform(range(1,16), j ->
                 (strpos('0123456789abcdef',
                         substr(substr(md5(text || '#' || CAST(i AS VARCHAR)),1,15), CAST(j AS INT), 1)) - 1)::BIGINT
                 << ((15-j)*4)::INT), 'sum') % 1000000 AS DOUBLE) / 1000000 AS feature
    FROM (SELECT doc_id, text, unnest(range(0, {mm.FEATURE_DIM})) AS i
          FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents) d)
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature extraction: {FEATURE_DIM} hash-derived
    values per payload, long-form output ready for the ANN operators."""
    return mm.feature_extract(_payload(spark, sf_dir), "doc_id")


RESIZE_W, RESIZE_H = 64, 64


@query(
    "mm_resize_images",
    oracle=f"""
    SELECT doc_id,
           CAST({RESIZE_W} AS BIGINT) AS width,
           CAST({RESIZE_H} AS BIGINT) AS height,
           md5(text || '@' || '{RESIZE_W}x{RESIZE_H}') AS resized_md5
    FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents) d
    """,
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize to {RESIZE_W}x{RESIZE_H} (deterministic fake kernel,
    real-codec seam documented in operators/multimodal.py)."""
    return mm.resize_images(_payload(spark, sf_dir), "doc_id", RESIZE_W, RESIZE_H)
