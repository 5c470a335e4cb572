"""Bucketed co-located joins must eliminate the shuffle: same results as
the plain join, and no Exchange under the join in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.operators import bucketing
from mapreduceproject_spark.sources.catalog import load_table


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    bucketing.write_bucketed(orders, "orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    bucketing.write_bucketed(lineitem, "lineitem_b", ["o_orderkey"], 8, ["o_orderkey"])

    # disable auto-broadcast: these fixture tables are tiny enough that the
    # planner would broadcast them, which hides the co-location property
    # bucketing exists to prove (at real scale both sides are too big to
    # broadcast and sort-merge is the only option)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(spark, "orders_b", "lineitem_b", ["o_orderkey"])
        agg = joined.groupBy("o_orderkey").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )

        # correctness vs. the plain (shuffling) join
        plain = (
            orders.join(lineitem, "o_orderkey")
            .groupBy("o_orderkey")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            )
        )
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))

        # the join must not introduce an Exchange: the bucket layout already
        # satisfies the join's distribution requirement on both sides
        join_plan = joined._jdf.queryExecution().sparkPlan().toString()
        assert "SortMergeJoin" in join_plan
        assert "Exchange" not in join_plan
        # and the groupBy on the bucket key reuses the same distribution too
        agg_plan = agg._jdf.queryExecution().sparkPlan().toString()
        assert "Exchange" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
