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


def test_replicated_join_rejects_small_side_outer(spark):
    """Right/full outer joins would emit an unmatched small-side row once
    per salt replica — must be rejected loudly."""
    import pytest

    from mapreduceproject_spark.operators import skew

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="replicated"):
            skew.replicated_broadcast_join(big, small, ["k"], buckets=4, how=how)
    # supported modes still work
    assert skew.replicated_broadcast_join(big, small, ["k"], how="left").count() == 10


def test_salt_values_bounded_and_overflow_safe(spark):
    """Salts must stay in [0, buckets) with the pmod-before-add form —
    (a%m + b%m) %m == (a+b)%m without the raw long addition that throws
    ARITHMETIC_OVERFLOW under ANSI when the hash lands near Long.MAX."""
    from mapreduceproject_spark.operators import skew

    df = spark.range(1000).withColumnRenamed("id", "k")
    salts = [
        r["_salt"] for r in skew.with_salt(df, ["k"], 16).select("_salt").collect()
    ]
    assert all(0 <= s < 16 for s in salts)
    assert len(set(salts)) > 1  # actually spreads
