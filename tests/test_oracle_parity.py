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


def test_comparator_inspects_array_cells():
    """Array cells arrive as numpy.ndarray from both engines; the
    comparator must compare ELEMENTS (with float tolerance), not
    str(ndarray) — whose summarized formatting elides long arrays."""
    import numpy as np
    import pandas as pd

    from mapreduceproject_spark.oracle import compare_frames

    big = np.arange(2000, dtype=np.float64)
    tweaked = big.copy()
    tweaked[1000] += 1.0  # mid-element diff: elided by str(ndarray)
    a = pd.DataFrame({"k": [1], "v": [big]})
    assert not compare_frames("t", a, pd.DataFrame({"k": [1], "v": [tweaked]})).ok
    # tolerance-close elements must MATCH even where repr formatting differs
    close = big + 1e-13
    assert compare_frames(
        "t", a, pd.DataFrame({"k": [1], "v": [close]})
    ).rows_match


def test_comparator_fast_path_handles_float_only_rows():
    """A frame with no distinguishing non-float cells must not degrade to
    an O(n^2) single-bucket scan: the exact fast path drains identical
    rows, and genuinely divergent rows still mismatch."""
    import time

    import pandas as pd

    from mapreduceproject_spark.oracle import compare_frames

    n = 20_000
    vals = [float(i) * 0.5 for i in range(n)]
    a = pd.DataFrame({"x": vals})
    t0 = time.perf_counter()
    assert compare_frames("t", a, pd.DataFrame({"x": list(vals)})).ok
    assert time.perf_counter() - t0 < 5.0
    bad = list(vals)
    bad[n // 2] += 1.0
    assert not compare_frames("t", a, pd.DataFrame({"x": bad})).ok


def test_rows_only_check_fails_on_zero_rows(spark, sf_dir):
    """A query registered without an oracle must still fail the parity
    check when it returns 0 rows — mirroring the driver's smoke, not
    fabricating an unconditional pass."""
    from mapreduceproject_spark.oracle import check_query
    from mapreduceproject_spark.plans import QUERIES

    name = "_rows_only_probe"
    QUERIES[name] = lambda sp, d: sp.range(0)
    try:
        assert not check_query(spark, name, sf_dir).ok
        QUERIES[name] = lambda sp, d: sp.range(3)
        assert check_query(spark, name, sf_dir).ok
    finally:
        del QUERIES[name]
