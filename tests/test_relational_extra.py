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


def test_gap_fill_island_invariants(spark, sf_dir):
    """Spine completeness, first-day-never-gap, and forward-fill equality
    against a per-user pandas replay."""
    import pandas as pd

    from mapreduceproject_spark.plans.registry import QUERIES

    pdf = QUERIES["events_gap_fill"](spark, sf_dir).toPandas()
    g = pdf.sort_values(["user_id", "d"]).groupby("user_id")
    spans = g["d"].agg(["min", "max", "count"])
    # spine is dense: one row per day in [first, last]
    expect = (spans["max"] - spans["min"]).dt.days + 1
    assert (spans["count"] == expect).all()
    # a user's first day is always real data, never a gap
    assert not g.head(1)["is_gap"].any()
    # forward fill: cents_filled equals pandas ffill of the real-day values
    real = pdf["cents_filled"].where(~pdf["is_gap"])
    ff = real.groupby(pdf["user_id"]).ffill()
    assert (pdf["cents_filled"] == ff).all()
    # gap rows contribute zero events
    assert (pdf.loc[pdf["is_gap"], "n_events"] == 0).all()
