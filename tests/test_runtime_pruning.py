"""Runtime pruning evidence: bloom-filter row pruning and dynamic
partition pruning.

At 100 TB the fastest byte is the one never read.  Two Catalyst
mechanisms make selective fact-dim joins cheap without any hand
scheduling, and these tests pin that they actually engage (a config or
plan-shape regression would silently degrade to full scans while all
results stay correct):

- **Runtime bloom filter** (SPARK-32268): when the creation side of a
  shuffle join carries a selective predicate, Catalyst injects a
  bloom-filter aggregate on it and a ``might_contain`` filter on the
  fact side — fact rows that cannot match are dropped *before* the
  shuffle.  On a 1000-executor join of a 100 TB fact against a filtered
  dim this removes most of the exchange traffic; locally we only lower
  ``applicationSideScanSizeThreshold`` (the fixtures are under the 10 GB
  default) and force SMJ (broadcast joins don't need the bloom).

- **Dynamic partition pruning** (SPARK-11150): a partitioned fact scan
  joined to a filtered dim gets a ``dynamicpruningexpression`` in its
  PartitionFilters — whole directories are skipped at runtime based on
  the dim's build-side values.  This is the mechanism that turns a
  date-partitioned 100 TB table + "last week" dim filter into a scan of
  7 partitions.

Both tests also assert result equality against the un-pruned plan —
pruning must be a pure physical optimization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceproject_spark.sources.catalog import load_table


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    # Scoped clone: conf changes must not leak into other tests' plans.
    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )

    def q(sess):
        fact = load_table(sess, sf_dir, "lineitem")
        dim = load_table(sess, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return fact.join(dim, fact.l_orderkey == dim.o_orderkey).agg(
            # decimal: the two plans (SMJ+bloom vs broadcast) sum in
            # different partition orders, and double addition is
            # order-dependent — same reasoning as the DPP test below
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
        )

    pruned = q(s)
    plan = _physical(pruned).lower()
    assert "might_contain" in plan or "bloomfilter" in plan, plan[:2000]
    # Pure optimization: same answer as the broadcast plan on the parent
    # session (no bloom there — broadcast joins don't inject one).
    baseline = q(spark)
    assert pruned.collect() == baseline.collect()


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_year")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def test_dynamic_partition_pruning_skips_directories(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    years = [(y, "mid" if y in (1995, 1996) else "other") for y in range(1992, 1999)]
    dim = spark.createDataFrame(years, "yr int, era string").filter(
        F.col("era") == "mid"
    )
    # decimal sum: double addition is partition-order-dependent, and the
    # point here is partition pruning, not float association
    rev = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    j = fact.join(dim, fact.o_year == dim.yr).agg(rev)
    plan = _physical(j)
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]
    # Equality vs the static-filter plan over the same partitioned data.
    static = fact.filter(F.col("o_year").isin(1995, 1996)).agg(rev)
    assert j.collect() == static.collect()
