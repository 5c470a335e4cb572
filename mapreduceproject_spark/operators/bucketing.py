"""Bucketed tables: co-located joins and aggregations with zero shuffle.

The reference's only data placement is FNV-hash replica assignment of
whole files (/root/reference/src/master_helpers.go:103-139) — unrelated to
join keys, so every multi-dataset operation would reshuffle everything.
Bucketing is the Spark-native answer at 100 TB: write both fact tables
hash-partitioned (and optionally sorted) by the join key once, and every
subsequent equi-join or aggregation on that key skips its Exchange — the
single biggest repeated-query saving on large warehouses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed parquet table.

    ``num_buckets`` plays the role the reference's hardcoded ``% 10`` ring
    played — but chosen per table, recorded in the catalog, and honored by
    the planner instead of being invisible to it.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned location (e.g. a previous session's managed-table dir
    # whose in-memory catalog entry is gone) blocks CREATE — clear it
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    # managed-table directories are stored LOWERCASED, and db-qualified
    # names live under <db>.db/<table> — clearing the raw name would
    # no-op on case-sensitive filesystems and CREATE would still fail
    # on the orphaned location this guard exists for.
    name = table.lower()
    if "." in name:
        db, tbl = name.split(".", 1)
        rel = f"{db}.db/{tbl}"
    else:
        rel = name
    shutil.rmtree(f"{warehouse}/{rel}", ignore_errors=True)

    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two tables bucketed on the same keys/count: shuffle-free."""
    return spark.table(left).join(spark.table(right), on)
