"""Differential test: every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + schema +
order-insensitive values), so anything green here should be green there.
"""

from __future__ import annotations

import pytest

from mapreduceproject_spark.oracle import check_query
from mapreduceproject_spark.plans import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    rep = check_query(spark, name, sf_dir)
    assert rep.ok, f"{name}: {rep.mismatches}"


def test_every_query_has_oracle_or_is_documented():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # Every query now carries a full-value oracle: even the HLL++ sketch is
    # checked via exact count + a deterministic accuracy-bound boolean.
    assert missing == [], f"queries without oracle: {missing}"
