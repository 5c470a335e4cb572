"""Multimodal (binary-column) operators for LLM-data pipelines.

The reference stores only opaque byte streams (/root/reference/src/node.go:623-669)
and never interprets them; here the engine treats image/audio/video as
``binary`` columns with typed metadata and processes them through
Arrow-batched ``mapInPandas`` — the correct Spark shape for media work:
the JVM never copies payloads row-at-a-time, Python sees columnar batches,
and the decode cost parallelizes per input partition with zero shuffle.

The actual media codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernels are **deterministic fakes** derived from md5 of the
payload — clearly marked, swappable for real decoders via the same
signatures — while everything Spark-side (schemas, Arrow batch iteration,
variable-row fan-out for frame sampling, partition parallelism) is real
and oracle-tested.  ``decode_image_real`` shows the gated real path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8
CHUNK_BYTES = 256
FRAME_STRIDE = 2


def _h60(data: bytes) -> int:
    """Python twin of functions.hashing.hash60 (md5 hex → 60-bit int)."""
    return int(hashlib.md5(data).hexdigest()[:15], 16)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize an opaque media column + typed metadata from a text
    column (fixtures carry no real media).  At ingest time this column
    would come straight off parquet/object storage as ``binary``."""
    # NULL text coalesces to '' so every kernel downstream sees a real
    # (possibly empty) bytes payload — a None payload would TypeError
    # inside the Arrow kernels (bytes(None)) and fail the whole query,
    # where the DuckDB oracles degrade to NULL rows.  An empty payload
    # flows through every kernel deterministically on both engines.
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        F.encode(t, "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.octet_length(t).cast("long").alias("n_bytes"),
            ((F.length(t) % 10) + 1).cast("long").alias("n_frames"),
        ).alias("media_meta"),
    )


def have_pillow() -> bool:
    """True when the optional Pillow extra is importable."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_image_real(df: DataFrame, id_col: str) -> DataFrame:
    """Real image decode: Pillow when present, else the vendored minimal
    PNG codec (functions/minipng.py — real zlib decode of spec PNG
    bytes, 8-bit grayscale/RGB non-interlaced only).

    Same mapInPandas shape as :func:`decode_stats` with the kernel
    swapped for an actual codec: per payload, decode → (width, height,
    mode, grayscale mean pixel).  The two codecs produce IDENTICAL
    output for PNGs both can read (the fallback mirrors Pillow's exact
    integer RGB→L conversion), so the choice never changes results —
    only the supported-format envelope.  Pillow remains the production
    path (arbitrary formats); the fallback exists so the real-decode
    kernel executes in minimal environments instead of skipping (a
    format outside its envelope raises ValueError from the kernel).
    The Spark-side plumbing — schema, Arrow batching, partition
    parallelism — is identical either way, so swapping codecs never
    touches the plan.
    """
    use_pil = have_pillow()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        if use_pil:
            from PIL import Image
        else:
            from mapreduceproject_spark.functions.minipng import (
                decode_png,
                luma,
            )

        for pdf in batches:
            ids, ws, hs, modes, means = [], [], [], [], []
            for _id, payload in zip(pdf[id_col], pdf["payload"], strict=True):
                if use_pil:
                    img = Image.open(io.BytesIO(bytes(payload)))
                    gray = list(img.convert("L").getdata())
                    w, h, mode = img.width, img.height, img.mode
                else:
                    w, h, mode, px = decode_png(bytes(payload))
                    if mode == "L":
                        gray = list(px)
                    else:
                        gray = [
                            luma(px[i], px[i + 1], px[i + 2])
                            for i in range(0, len(px), 3)
                        ]
                ids.append(int(_id))
                ws.append(w)
                hs.append(h)
                modes.append(mode)
                means.append(float(sum(gray)) / max(len(gray), 1))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "mode": pd.Series(modes, dtype="object"),
                    "mean_pixel": pd.Series(means, dtype="float64"),
                }
            )

    from mapreduceproject_spark.bootstrap import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        kernel, "doc_id long, width long, height long, mode string, mean_pixel double"
    )


def decode_stats(df: DataFrame, id_col: str) -> DataFrame:
    """Per-payload decode summary (deterministic fake kernel).

    Output: (id, n_bytes, content_md5, mean_pixel).  One Arrow-batched
    pass over the scan, no shuffle; at 100 TB the work is purely
    partition-parallel and the output is metadata-sized.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            md5s = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": md5s,
                    # fake "mean pixel": low 8 bits of the 60-bit payload hash
                    "mean_pixel": md5s.map(lambda h: int(h[:15], 16) % 256).astype(
                        "int64"
                    ),
                }
            )

    return df.mapInPandas(
        kernel, "doc_id long, n_bytes long, content_md5 string, mean_pixel long"
    )


def frame_sample(df: DataFrame, id_col: str) -> DataFrame:
    """Sample every ``FRAME_STRIDE``-th frame of each "video" payload.

    Demonstrates variable-row fan-out through mapInPandas: one input row
    yields ceil(n_frames/stride) output rows.  Frame "content" is the
    deterministic fake md5(payload + ':' + idx).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for _id, payload, nf in zip(
                pdf[id_col], pdf["payload"], pdf["n_frames"], strict=True
            ):
                for fi in range(0, int(nf), FRAME_STRIDE):
                    ids.append(int(_id))
                    idxs.append(fi)
                    md5s.append(
                        hashlib.md5(
                            bytes(payload) + b":" + str(fi).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    flat = df.select(
        F.col(id_col), F.col("payload"), F.col("media_meta.n_frames").alias("n_frames")
    )
    return flat.mapInPandas(kernel, "doc_id long, frame_idx long, frame_md5 string")


def audio_chunks(df: DataFrame, id_col: str) -> DataFrame:
    """Fixed-size byte chunking (the audio-segmentation shape): split each
    payload into ``CHUNK_BYTES`` windows, emit per-chunk md5."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, sizes = [], [], [], []
            for _id, payload in zip(pdf[id_col], pdf["payload"], strict=True):
                b = bytes(payload)
                for ci, off in enumerate(range(0, len(b), CHUNK_BYTES)):
                    chunk = b[off : off + CHUNK_BYTES]
                    ids.append(int(_id))
                    idxs.append(ci)
                    sizes.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "chunk_bytes": pd.Series(sizes, dtype="int64"),
                    "chunk_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        kernel, "doc_id long, chunk_idx long, chunk_bytes long, chunk_md5 string"
    )


def feature_extract(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic fake feature extractor: ``FEATURE_DIM`` values per
    payload, f_i = hash60(payload + '#' + i) % 1e6 / 1e6.

    Emitted long-form (id, dim, feature) — array columns round-trip
    awkwardly through comparison harnesses, and long form feeds straight
    into the similarity operators.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dims, feats = [], [], []
            for _id, payload in zip(pdf[id_col], pdf["payload"], strict=True):
                b = bytes(payload)
                for i in range(FEATURE_DIM):
                    ids.append(int(_id))
                    dims.append(i)
                    feats.append(
                        (_h60(b + b"#" + str(i).encode()) % 1_000_000) / 1_000_000
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dim": pd.Series(dims, dtype="int64"),
                    "feature": pd.Series(feats, dtype="float64"),
                }
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        kernel, "doc_id long, dim long, feature double"
    )


def resize_images(df: DataFrame, id_col: str, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Image resize (deterministic fake kernel): recompute dimensions +
    emit the 'resized' content hash md5(payload + WxH).

    The real kernel swaps in a PIL/opencv call with the same signature —
    per-row, Arrow-batched, no shuffle; output metadata is what downstream
    training-shard writers consume.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dims = f"{target_w}x{target_h}".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([target_w] * len(pdf), dtype="int64"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int64"),
                    "resized_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b) + b"@" + dims).hexdigest()
                    ),
                }
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        kernel, "doc_id long, width long, height long, resized_md5 string"
    )
