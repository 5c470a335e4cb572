"""Shard writer: lossless, deterministic across re-runs, prunable."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.sources import shards
from mapreduceproject_spark.sources.catalog import load_table


def test_shards_roundtrip_and_determinism(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    shards.write_training_shards(docs, p1, ["doc_id"], n_shards=4, partition_cols=["lang"])
    shards.write_training_shards(docs, p2, ["doc_id"], n_shards=4, partition_cols=["lang"])

    back1 = spark.read.parquet(p1)
    assert back1.count() == docs.count()
    # shard ids complete and within range
    got_shards = {r["shard"] for r in back1.select("shard").distinct().collect()}
    assert got_shards <= set(range(4)) and len(got_shards) >= 2

    # deterministic membership: identical (doc_id -> shard) on both runs
    m1 = dict((r["doc_id"], r["shard"]) for r in back1.select("doc_id", "shard").collect())
    m2 = dict(
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(p2).select("doc_id", "shard").collect()
    )
    assert m1 == m2

    # single-shard read prunes to the shard directory
    one = shards.read_shard(spark, p1, shard=min(got_shards))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    expect = {k for k, v in m1.items() if v == min(got_shards)}
    assert {r["doc_id"] for r in one.select("doc_id").collect()} == expect
