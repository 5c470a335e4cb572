"""Multimodal plumbing tests beyond oracle parity: the gated real-decode
stub, and Arrow batch-shape invariance (results identical however the
input is partitioned)."""

from __future__ import annotations

import pytest

from mapreduceproject_spark.operators import multimodal as mm
from mapreduceproject_spark.sources.catalog import load_table


def test_decode_image_real_is_gated(spark, sf_dir):
    if mm.have_pillow():
        pytest.skip("Pillow present — covered by test_decode_image_real_with_pillow")
    payload = mm.attach_binary_payload(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_image_real(payload, "doc_id")


def test_decode_image_real_with_pillow(spark):
    """Real-codec path, exercised only where the optional extra exists:
    encode tiny PNGs driver-side, decode through the Arrow kernel, check
    exact dimensions and mean pixel."""
    if not mm.have_pillow():
        pytest.skip("Pillow not installed in this environment")
    import io

    from PIL import Image

    def png_bytes(w, h, value):
        img = Image.new("L", (w, h), value)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png_bytes(4, 2, 10)), (2, png_bytes(3, 3, 200))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.decode_image_real(df, "doc_id").collect()}
    assert (got[1]["width"], got[1]["height"]) == (4, 2)
    assert got[1]["mean_pixel"] == pytest.approx(10.0)
    assert (got[2]["width"], got[2]["height"]) == (3, 3)
    assert got[2]["mean_pixel"] == pytest.approx(200.0)


def test_partitioning_invariance(spark, sf_dir):
    payload = mm.attach_binary_payload(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    one = mm.frame_sample(payload.coalesce(1), "doc_id")
    many = mm.frame_sample(payload.repartition(7), "doc_id")
    rows_one = sorted(map(tuple, one.collect()))
    rows_many = sorted(map(tuple, many.collect()))
    assert rows_one == rows_many and len(rows_one) > 0


def test_media_meta_schema(spark, sf_dir):
    payload = mm.attach_binary_payload(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    fields = dict(payload.dtypes)
    assert fields["payload"] == "binary"
    assert fields["media_meta"] == "struct<format:string,n_bytes:bigint,n_frames:bigint>"
