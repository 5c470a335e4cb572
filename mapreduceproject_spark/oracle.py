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
    from collections import defaultdict

    def float_blind(row):
        return tuple(("f",) if t[0] == "f" else t for t in row)

    remaining: dict[tuple, list[tuple]] = defaultdict(list)
    for row in _canon_rows(oracle_pdf):
        remaining[float_blind(row)].append(row)
    bad = 0
    for srow in _canon_rows(spark_pdf):
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
    rows = sorted(
        tuple(
            repr(round(v, 6)) if isinstance(v, float) else repr(v)
            for v in row
        )
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()


def check_query(spark, name: str, sf_dir: str) -> ParityReport:
    from mapreduceproject_spark.plans import ORACLES, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only check, like the driver's weaker path
        return ParityReport(name, len(spark_pdf), len(spark_pdf), True, True)
    con = duck_connect(sf_dir)
    try:
        oracle_pdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
