"""Training-shard writer: deterministic, resumable dataset output.

The last stage of a training-data pipeline: write the cleaned corpus as
a fixed number of content-addressed shards, optionally partitioned by
split/language, so downstream loaders can read shard i of n without
listing the world and a re-run of the pipeline produces byte-identical
shard membership (hash-of-content, not round-robin or rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_shard(df: DataFrame, key_cols: list[str], n_shards: int) -> DataFrame:
    """Deterministic shard id in [0, n_shards) from the key columns."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_shards))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int,
    partition_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as hash-sharded parquet under ``path``.

    Layout: ``path/[partition=.../]shard=K/part-*.parquet``.  The
    pre-write ``repartition(n_shards, shard)`` lines tasks up with shard
    dirs (≈1 file per shard per partition value); ``max_records_per_file``
    caps file size for loader-friendly chunks.
    """
    out = with_shard(df, key_cols, n_shards).repartition(n_shards, F.col("shard"))
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*[*(partition_cols or []), "shard"]).parquet(path)


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read a single shard — partition pruning keeps the scan to one dir."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)
