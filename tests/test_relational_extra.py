"""Checks for queries whose semantics the oracle can't fully pin down."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.plans import QUERIES
from mapreduceproject_spark.sources.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        # The query itself carries the HLL-vs-exact bound as a column.
        assert r["exact_users"] == exact[r["event_type"]]
        assert r["within_rsd_bound"] is True, r
