"""Multimodal plumbing tests beyond oracle parity: the gated real-decode
stub, and Arrow batch-shape invariance (results identical however the
input is partitioned)."""

from __future__ import annotations

import pytest

from mapreduceproject_spark.operators import multimodal as mm
from mapreduceproject_spark.sources.catalog import load_table


def test_decode_image_real_is_gated(spark, sf_dir):
    payload = mm.attach_binary_payload(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_image_real(payload, "doc_id")


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
