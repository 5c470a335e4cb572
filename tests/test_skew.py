"""Salting helpers must produce results identical to their unsalted
equivalents — salt is an execution detail, never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.operators import skew
from mapreduceproject_spark.sources.catalog import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_count_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(F.count("*").alias("count"))
    salted = skew.salted_count(ev, ["event_type"], salt_from=["event_id"], buckets=16)
    assert _rows(salted) == _rows(plain)


def test_replicated_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    big = orders.withColumnRenamed("o_custkey", "c_custkey")
    salted = skew.replicated_broadcast_join(big, cust, on=["c_custkey"]).select(
        "o_orderkey", "c_name"
    )
    assert _rows(salted) == _rows(plain)


def test_skew_report_shares_sum_sensibly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rep = skew.skew_report(ev, ["event_type"], top=5).collect()
    assert 0 < len(rep) <= 5
    assert all(0.0 < r["share"] <= 1.0 for r in rep)
    # ordered hottest-first
    ns = [r["n"] for r in rep]
    assert ns == sorted(ns, reverse=True)
