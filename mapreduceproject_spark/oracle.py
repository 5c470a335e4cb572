"""DuckDB-oracle differential harness (mirrors the driver's check).

For a named query: run the Spark plan and the oracle SQL over the same
parquet tables, then compare (row count, column names, order-insensitive
values).  Floats compare with a small relative tolerance; everything else
exactly.  Used by tests/test_oracle_parity.py and by dev loops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from mapreduceproject_spark.sources.catalog import TABLES

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every fixture table as a view, as the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{sf_dir.rstrip('/')}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return ("N",)
    # numpy first: array cells arrive as np.ndarray from BOTH engines
    # (Arrow toPandas and DuckDB .df()), and ndarray is NOT a list/tuple —
    # without this branch arrays fell through to ("o", str(ndarray)),
    # whose summarized formatting elides long arrays (middle-element
    # diffs compared EQUAL) and prints ~8 significant digits (tolerance-
    # close values compared UNEQUAL).  np.floating covers float32, which
    # unlike float64 is not a subclass of Python float.
    if isinstance(v, np.ndarray):
        return ("l", tuple(_canon_cell(x) for x in v.tolist()))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            # NaN ≡ NULL is INTENTIONAL: pandas materializes SQL NULL in a
            # double column as NaN, so a DuckDB NULL and a Spark None in
            # the same float column would otherwise spuriously diverge.
            # The cost — a genuine engine-produced NaN masquerading as
            # NULL — is accepted; no registered query emits NaN.
            return ("N",)
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon_cell(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v)
    return ("o", str(v))


def _canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    # itertuples over the column-sorted frame: same cells as the old
    # iterrows loop (values pass through object dtype unchanged) at ~10x
    # the speed — the comparator dominated wall-clock on per-row outputs
    # (window_running_sum spent 40 s comparing 15k-row frames).
    cols = sorted(pdf.columns)
    return [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]


def _cells_equal(a, b) -> bool:
    if a[0] != b[0]:
        return False
    if a[0] == "f":
        return math.isclose(a[1], b[1], rel_tol=FLOAT_REL_TOL, abs_tol=FLOAT_ABS_TOL)
    if a[0] == "l":
        return len(a[1]) == len(b[1]) and all(
            _cells_equal(x, y) for x, y in zip(a[1], b[1])
        )
    return a == b


@dataclass
class ParityReport:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    rows_match: bool
    mismatches: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.rows_match
        )


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityReport:
    rep = ParityReport(
        name=name,
        spark_rows=len(spark_pdf),
        oracle_rows=len(oracle_pdf),
        columns_match=sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        rows_match=False,
    )
    if not rep.columns_match:
        rep.mismatches.append(
            f"columns spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return rep
    if rep.spark_rows != rep.oracle_rows:
        rep.mismatches.append(f"rowcount spark={rep.spark_rows} oracle={rep.oracle_rows}")
        return rep
    # Multiset matching with float tolerance — NOT sort-then-zip: two rows
    # identical except for floats agreeing only to the sort key's precision
    # can order differently on the two engines and produce false positional
    # mismatches.  Rows group by their non-float cells (exact), and within
    # a group each Spark row claims one tolerance-close oracle row.
    def float_blind_cell(t):
        # recurse into array cells: a float inside an array<double> must
        # be just as bucket-blind as a top-level float, or tolerance-
        # close arrays land in different buckets and never get compared.
        if t[0] == "f":
            return ("f",)
        if t[0] == "l":
            return ("l", tuple(float_blind_cell(x) for x in t[1]))
        return t

    def float_blind(row):
        return tuple(float_blind_cell(t) for t in row)

    # Exact-match fast path first: engines usually agree bit-for-bit, so
    # an exact multiset Counter drains almost every row in O(n); the
    # tolerance scan below then only sees last-ulp leftovers.  Without
    # this, a frame whose rows have no distinguishing non-float cells
    # collapses into ONE float_blind bucket and the scan is O(n² · cols).
    from collections import Counter, defaultdict

    o_left = Counter(_canon_rows(oracle_pdf))
    s_left: list[tuple] = []
    for srow in _canon_rows(spark_pdf):
        if o_left.get(srow, 0) > 0:
            o_left[srow] -= 1
        else:
            s_left.append(srow)
    remaining: dict[tuple, list[tuple]] = defaultdict(list)
    for row, n in o_left.items():
        for _ in range(n):
            remaining[float_blind(row)].append(row)
    bad = 0
    for srow in s_left:
        cands = remaining.get(float_blind(srow), [])
        for i, orow in enumerate(cands):
            if all(_cells_equal(a, b) for a, b in zip(srow, orow)):
                cands.pop(i)
                break
        else:
            if bad < 5:
                rep.mismatches.append(f"unmatched spark row {srow}")
            bad += 1
    rep.rows_match = bad == 0
    if bad:
        rep.mismatches.append(f"{bad} unmatched rows total")
        return rep
    # Second gate: the DRIVER's hash is stricter than tolerance matching —
    # repr(round(float, 6)) per cell, so (a) a float sitting ON a rounding
    # boundary where the engines differ in the last ulps, and (b) a NULL
    # boolean (pandas None on one engine, NaN on the other) both flip it
    # while passing the tolerance compare.  Replicate it exactly so pytest
    # fails where the driver would (caught pagerank_knn + is_anomaly).
    if _driver_hash(spark_pdf) != _driver_hash(oracle_pdf):
        rep.rows_match = False
        rep.mismatches.append("driver-style value hash differs (round-6 repr)")
    return rep


def _driver_hash(pdf: pd.DataFrame) -> str:
    import hashlib

    cols = sorted(pdf.columns)

    # itertuples, not iterrows: iterrows coerces each row to a common
    # dtype (ints silently become floats next to a float column), which
    # only masked cross-engine dtype drift; per-column values are what
    # the driver hashes.  Both frames hash through this same path, so
    # the comparison stays internally consistent either way.
    # One deliberate divergence from the driver: an ndarray cell hashes
    # as a tuple of its round-6 elements, NOT repr(ndarray) — numpy's
    # summarized repr elides long arrays (middle-element diffs would
    # hash EQUAL) and floats format at print precision (stable values
    # could hash UNEQUAL).  Element-wise round-6 is the scalar rule
    # applied inside the array: strictly stronger than the driver's
    # formatting on the cases that matter.
    def cell(v):
        if isinstance(v, np.ndarray):
            return repr(tuple(cell(x) for x in v.tolist()))
        if isinstance(v, (list, tuple)):  # non-Arrow path yields lists
            return repr(tuple(cell(x) for x in v))
        if isinstance(v, np.floating):
            v = float(v)
        return repr(round(v, 6)) if isinstance(v, float) else repr(v)

    rows = sorted(
        tuple(cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()


def check_query(spark, name: str, sf_dir: str) -> ParityReport:
    from mapreduceproject_spark.plans import ORACLES, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only check, like the driver's weaker path: no oracle to
        # compare against, but "ran and produced rows" is still a real
        # assertion — do NOT fabricate an unconditional pass (a query
        # regressing to 0 rows must fail here exactly as it would fail
        # the driver's smoke).  oracle_rows mirrors spark_rows only so
        # the ok property's rowcount clause is inert in this mode.
        n = len(spark_pdf)
        return ParityReport(
            name,
            n,
            n,
            True,
            rows_match=n > 0,
            mismatches=[] if n > 0 else ["rows-only check: query returned 0 rows"],
        )
    con = duck_connect(sf_dir)
    try:
        oracle_pdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
