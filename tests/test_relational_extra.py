"""Checks for queries whose semantics the oracle can't fully pin down."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.plans import QUERIES
from mapreduceproject_spark.sources.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        # rsd=0.02 → generous 10% envelope for small groups
        assert abs(approx[k] - e) <= max(2, 0.1 * e), (k, approx[k], e)
