"""Storage-layout queries: the Z-order clustering audit.

One query, two layouts: split lineitem into 64 equal "files" under a
linear (l_partkey, l_suppkey) sort and under a Morton/Z-order sort, and
report the summed per-file min/max extents a parquet-footer pruner would
see on each key.  The z-order row's much tighter l_suppkey extents at
modestly wider l_partkey extents is the quantified case for CLUSTER BY
zorder on a 100 TB table queried by either key (operators/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduceproject_spark.operators.layout import (
    duck_zorder,
    layout_extents,
)
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

N_BUCKETS = 64


def _zorder_oracle() -> str:
    z = duck_zorder("l_partkey", "l_suppkey")
    return f"""
    WITH base AS (
      SELECT l_partkey AS a, l_suppkey AS b, l_orderkey, l_linenumber,
             {z} AS zkey
      FROM lineitem
    ),
    lin AS (
      SELECT a, b,
             ntile({N_BUCKETS}) OVER (ORDER BY a, b, l_orderkey, l_linenumber) AS bucket
      FROM base
    ),
    zor AS (
      SELECT a, b,
             ntile({N_BUCKETS}) OVER (ORDER BY zkey, l_orderkey, l_linenumber) AS bucket
      FROM base
    ),
    le AS (SELECT bucket, MAX(a) - MIN(a) + 1 AS ea, MAX(b) - MIN(b) + 1 AS eb
           FROM lin GROUP BY bucket),
    ze AS (SELECT bucket, MAX(a) - MIN(a) + 1 AS ea, MAX(b) - MIN(b) + 1 AS eb
           FROM zor GROUP BY bucket)
    SELECT 'linear' AS layout, COUNT(*) AS n_buckets,
           CAST(SUM(ea) AS BIGINT) AS sum_extent_a,
           CAST(SUM(eb) AS BIGINT) AS sum_extent_b
    FROM le
    UNION ALL
    SELECT 'zorder' AS layout, COUNT(*) AS n_buckets,
           CAST(SUM(ea) AS BIGINT) AS sum_extent_a,
           CAST(SUM(eb) AS BIGINT) AS sum_extent_b
    FROM ze
    """


@query("zorder_layout_extents", oracle=_zorder_oracle())
def zorder_layout_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max-pruning audit of linear vs Z-order file layout on
    lineitem(l_partkey, l_suppkey): {N_BUCKETS} files per layout, summed
    per-file extents per key (operators/layout.py::layout_extents)."""
    li = load_table(spark, sf_dir, "lineitem")
    return layout_extents(
        li, "l_partkey", "l_suppkey", ["l_orderkey", "l_linenumber"],
        n_buckets=N_BUCKETS,
    )
