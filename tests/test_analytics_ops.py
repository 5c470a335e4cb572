"""Hand-truth tests for the warehouse-analytics tier — fixed tiny inputs
with independently computed expected outputs, complementing the DuckDB
oracle parity in tests/test_oracle_parity.py (two engines agreeing could
in principle share a bug; a hand-derived answer can't).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.operators.graph import (
    degree_histogram,
    triangle_census,
    undirected_edges,
)


# -- graph census ------------------------------------------------------------
def test_triangle_census_hand_graph(spark):
    # Two triangles sharing edge (1,2): {1,2,3} and {1,2,4}; plus a
    # pendant node 5 attached to 3.  Directed duplicates and both
    # orientations must collapse.
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 1),          # duplicate orientation
            (1, 3), (2, 3),
            (1, 4), (4, 2),
            (3, 5),
            (3, 3),                   # self-loop must be dropped
        ],
        "src long, dst long",
    )
    row = triangle_census(edges).collect()[0]
    assert row.n_nodes == 5
    assert row.n_edges == 6          # (1,2)(1,3)(2,3)(1,4)(2,4)(3,5)
    # degrees: 1:3, 2:3, 3:3, 4:2, 5:1 -> wedges = 3+3+3+1+0 = 10
    assert row.n_wedges == 10
    assert row.n_triangles == 2
    assert row.global_clustering == 3 * 2 / 10


def test_degree_histogram_hand_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4)], "src long, dst long"
    )
    hist = {r.deg: r.n_nodes for r in degree_histogram(edges).collect()}
    # node 1 has degree 3; nodes 2,3,4 degree 1
    assert hist == {3: 1, 1: 3}


def test_undirected_edges_canonicalize(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 3), (4, 1)], "src long, dst long"
    )
    got = {(r.a, r.b) for r in undirected_edges(edges).collect()}
    assert got == {(1, 2), (1, 4)}


# -- EWMA exactness ----------------------------------------------------------
def test_ewma_matches_fraction_exact_reference(spark, sf_dir):
    """The operator's claim is *exact dyadic arithmetic*: the Spark result
    must equal the Fraction-computed EWMA bit-for-bit, not approximately."""
    from mapreduceproject_spark.plans.analytics_queries import (
        EWMA_LAGS,
        ewma_user_values,
    )
    from mapreduceproject_spark.sources.catalog import load_table

    got = {
        r.user_id: (r.n_used, r.ewma_value)
        for r in ewma_user_values(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    import math

    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id), reverse=True)
        last = evs[:EWMA_LAGS]
        num = Fraction(0)
        den = Fraction(0)
        for rn, r in enumerate(last, start=1):
            cents = math.floor(r.value * 100)
            num += Fraction(cents, 2**rn)
            den += Fraction(1, 2**rn)
        expect = float(num / den) / 100.0
        n_used, ewma = got[uid]
        assert n_used == len(last)
        assert ewma == expect, f"user {uid}: {ewma} != exact {expect}"


# -- attribution edge cases --------------------------------------------------
def test_attribution_hand_timeline(spark, tmp_path):
    """Boundary behavior: a touch exactly at the 7-day limit qualifies,
    one microsecond past does not; purchases with no prior touch are
    'none'; a later touch overrides an earlier one."""
    import datetime as dt

    from mapreduceproject_spark.plans.analytics_queries import (
        attribution_last_touch,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    day = dt.timedelta(days=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: click then purchase 7 days later exactly -> 'click'
        Row(event_id=1, ts=t0, user_id=1, event_type="click", value=0.0, props="{}"),
        Row(event_id=2, ts=t0 + 7 * day, user_id=1, event_type="purchase", value=10.0, props="{}"),
        # user 2: view then purchase 7 days + 1us later -> 'none'
        Row(event_id=3, ts=t0, user_id=2, event_type="view", value=0.0, props="{}"),
        Row(event_id=4, ts=t0 + 7 * day + us, user_id=2, event_type="purchase", value=20.0, props="{}"),
        # user 3: purchase with no touch -> 'none'
        Row(event_id=5, ts=t0, user_id=3, event_type="purchase", value=40.0, props="{}"),
        # user 4: view, then click, then purchase -> last touch 'click'
        Row(event_id=6, ts=t0, user_id=4, event_type="view", value=0.0, props="{}"),
        Row(event_id=7, ts=t0 + day, user_id=4, event_type="click", value=0.0, props="{}"),
        Row(event_id=8, ts=t0 + 2 * day, user_id=4, event_type="purchase", value=5.0, props="{}"),
        # an unrelated event type must be ignored entirely
        Row(event_id=9, ts=t0 + day, user_id=3, event_type="error", value=0.0, props="{}"),
    ]
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).write.parquet(path)
    # attribution_last_touch loads "<dir>/events.parquet"
    out = {
        r.channel: (r.n_purchases, r.revenue)
        for r in attribution_last_touch(spark, str(tmp_path)).collect()
    }
    assert out == {"click": (2, 15.0), "none": (2, 60.0)}


# -- robust stats interpolation ----------------------------------------------
def test_mad_interpolation_even_group(spark):
    from mapreduceproject_spark.operators import text_analysis  # noqa: F401

    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 5), ("a", 100)], "source string, x long"
    )
    med = df.groupBy("source").agg(F.expr("percentile(x, 0.5D)").alias("med"))
    r = (
        df.join(F.broadcast(med), "source")
        .groupBy("source")
        .agg(F.expr("percentile(abs(x - med), 0.5D)").alias("mad"))
        .collect()[0]
    )
    # median = (3+5)/2 = 4; |x-4| = [3,1,1,96] -> sorted [1,1,3,96], MAD = 2
    assert r.mad == 2.0


# -- market basket hand case -------------------------------------------------
def test_basket_pair_counting_logic(spark):
    ob = spark.createDataFrame(
        [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"), (3, "A")],
        "l_orderkey long, brand string",
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(F.col("a.brand").alias("x"), F.col("b.brand").alias("y"))
        .agg(F.count("*").alias("n"))
    )
    got = {(r.x, r.y): r.n for r in pairs.collect()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


# -- skyline hand case -------------------------------------------------------
def test_skyline_dominance_logic(spark):
    from pyspark.sql import Window

    # points: (price, size). Frontier: (1,5), (2,7), (4,9).
    # (3,7) dominated by (2,7)? equal size, cheaper exists -> dominated
    # (skyline keeps strictly-better-size only among cheaper-or-equal).
    pts = spark.createDataFrame(
        [(1, 100, 5), (2, 200, 7), (3, 300, 7), (4, 400, 9), (5, 500, 3)],
        "p_partkey long, price_cents long, size long",
    )
    w = (
        Window.orderBy("price_cents", F.desc("size"), "p_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = pts.withColumn("best_prev", F.max("size").over(w))
    keep = {
        r.p_partkey
        for r in m.filter(
            F.col("best_prev").isNull() | (F.col("size") > F.col("best_prev"))
        ).collect()
    }
    assert keep == {1, 2, 4}


# -- transition matrix hand case ---------------------------------------------
def test_transition_matrix_hand_sequence(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from mapreduceproject_spark.plans.analytics_queries import (
        event_transition_matrix,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> view  (view->click, click->view)
        Row(event_id=1, ts=t0, user_id=1, event_type="view", value=0.0, props="{}"),
        Row(event_id=2, ts=t0 + s, user_id=1, event_type="click", value=0.0, props="{}"),
        Row(event_id=3, ts=t0 + 2 * s, user_id=1, event_type="view", value=0.0, props="{}"),
        # user 2: view -> view  (view->view)
        Row(event_id=4, ts=t0, user_id=2, event_type="view", value=0.0, props="{}"),
        Row(event_id=5, ts=t0 + s, user_id=2, event_type="view", value=0.0, props="{}"),
        # user 3: single event, no transition
        Row(event_id=6, ts=t0, user_id=3, event_type="click", value=0.0, props="{}"),
    ]
    spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transition_matrix(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_skyline_two_phase_equals_single_pass(spark, sf_dir):
    """Lossless pruning claim: the bucketed two-phase skyline must return
    EXACTLY the global single-pass frontier, for any bucket count."""
    from mapreduceproject_spark.operators.skyline import (
        skyline_2d,
        skyline_2d_two_phase,
    )
    from mapreduceproject_spark.sources.catalog import load_table

    v = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("x"),
        F.col("p_size").cast("long").alias("y"),
    )
    single = {tuple(r) for r in skyline_2d(v, "x", "y", ["p_partkey"]).collect()}
    for buckets in (1, 7, 64):
        two = {
            tuple(r)
            for r in skyline_2d_two_phase(
                v, "x", "y", ["p_partkey"], buckets=buckets
            ).collect()
        }
        assert two == single, f"buckets={buckets}"


def test_equidepth_approx_contract(spark, sf_dir):
    """The production-path histogram (approx_percentile bounds + one
    conditional assignment pass, no global sort) must produce monotonic
    non-overlapping buckets that preserve the total count and stay near
    equi-depth."""
    from mapreduceproject_spark.operators.histogram import equidepth_approx
    from mapreduceproject_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    n_total = li.count()
    buckets = 8
    rows = sorted(
        equidepth_approx(li, "cents", buckets=buckets).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(1, buckets + 1))
    assert sum(r.n for r in rows) == n_total
    for prev, cur in zip(rows, rows[1:]):
        assert prev.hi <= cur.lo  # non-overlapping, ordered
    target = n_total / buckets
    for r in rows:
        # sketch accuracy 10_000 on a ~6e3-row fixture: generous band
        assert 0.5 * target <= r.n <= 1.5 * target, (r.bucket, r.n, target)


# -- randomized brute-force cross-checks -------------------------------------
import pytest


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_skyline_matches_bruteforce_on_random_points(spark, seed):
    """The window skyline must equal the O(n²) dominance definition on
    random point sets (with duplicate coordinates to stress ties)."""
    import random

    from mapreduceproject_spark.operators.skyline import skyline_2d

    rng = random.Random(seed)
    pts = [(i, rng.randrange(0, 40), rng.randrange(0, 40)) for i in range(200)]
    # brute force: keep p unless some q has x<=, y>= with one strict
    keep = {
        pid
        for pid, x, y in pts
        if not any(
            (qx <= x and qy >= y and (qx < x or qy > y)) for _, qx, qy in pts
        )
    }
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    got = {r.pid for r in skyline_2d(df, "x", "y", ["pid"]).collect()}
    # the window formulation keeps one representative per duplicate
    # (x, y) point on the frontier (the lowest tiebreak); brute force
    # keeps all of them — compare frontier COORDINATES, which must match
    # exactly, and representatives must be a subset of the brute set
    coords = {(x, y) for pid, x, y in pts if pid in keep}
    got_coords = {(x, y) for pid, x, y in pts if pid in got}
    assert got_coords == coords
    assert got <= keep


def test_transition_matrix_rows_sum_to_one(spark, sf_dir):
    from mapreduceproject_spark.plans.analytics_queries import (
        event_transition_matrix,
    )

    rows = event_transition_matrix(spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    assert by_from, "no transitions on the fixture"
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-9, (ft, total)


def test_zipf_fit_survives_large_vocabulary(spark, tmp_path):
    """Regression: with LN_SCALE=1e6 the normal-equation products
    overflowed int64 (ANSI-mode crash) once the vocabulary passed ~600
    distinct tokens — the fixtures' tiny vocab masked it.  2,500 distinct
    tokens must fit comfortably and yield the analytic Zipf slope."""
    from mapreduceproject_spark.plans.analytics_queries import token_zipf_fit

    # synthetic zipfian corpus: token w_i appears ~N/i times
    words = []
    for i in range(1, 2501):
        words.extend([f"w{i:04d}"] * max(1, 2500 // i))
    docs = [
        (d, " ".join(words[d::50]), "en", "synthetic", 0)
        for d in range(50)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = token_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row.n_ranks == 1000
    assert -1.3 < row.zipf_slope < -0.7, row
    assert row.r2 > 0.9


def test_equidepth_approx_ignores_nulls(spark):
    from mapreduceproject_spark.operators.histogram import equidepth_approx

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)] * 50, "v double"
    )
    rows = equidepth_approx(df, "v", buckets=4).collect()
    assert sum(r.n for r in rows) == 100  # NULLs excluded, not bucket-1 noise


def test_sessionize_hand_timeline(spark, tmp_path):
    """Gap-boundary behavior: exactly 30 minutes of silence continues the
    session, 30 minutes + 1 µs starts a new one; a lone event is a
    1-event zero-duration session; session_idx restarts per user."""
    import datetime as dt

    from mapreduceproject_spark.plans.analytics_queries import batch_sessionize

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    m = dt.timedelta(minutes=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: [e1, e2 (gap exactly 30m -> SAME session)],
        #         [e3 (gap 30m + 1us -> NEW session), e4]
        Row(event_id=1, ts=t0, user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=t0 + 30 * m, user_id=1, event_type="view", value=2.0, props="{}"),
        Row(event_id=3, ts=t0 + 60 * m + us, user_id=1, event_type="view", value=4.0, props="{}"),
        Row(event_id=4, ts=t0 + 70 * m + us, user_id=1, event_type="view", value=8.0, props="{}"),
        # user 2: a single event -> one zero-duration session
        Row(event_id=5, ts=t0, user_id=2, event_type="view", value=16.0, props="{}"),
    ]
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).write.parquet(path)
    out = {
        (r.user_id, r.session_idx): (r.start_us, r.duration_us, r.n_events, r.value_sum)
        for r in batch_sessionize(spark, str(tmp_path)).collect()
    }
    t0_us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    thirty = 30 * 60 * 1_000_000
    assert out == {
        (1, 1): (t0_us, thirty, 2, 3.0),
        (1, 2): (t0_us + 2 * thirty + 1, 10 * 60 * 1_000_000, 2, 12.0),
        (2, 1): (t0_us, 0, 1, 16.0),
    }


def test_interval_overlap_pairs_hand_truth(spark):
    """Bin-replicated interval join: touching intervals count (overlap
    0), disjoint ones don't, a pair sharing MANY bins is emitted once
    (count-once rule), distinct_col excludes same-user pairs, and keys
    partition the space."""
    from mapreduceproject_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    rows = [
        # key, id, user, start, end
        ("k1", 1, 10, 0.0, 100.0),
        ("k1", 2, 11, 100.0, 150.0),   # touches id 1 at t=100 -> overlap 0
        ("k1", 3, 12, 200.0, 300.0),   # disjoint from 1 and 2
        ("k1", 4, 10, 50.0, 60.0),     # overlaps 1 but SAME user -> excluded
        # ids 5,6: overlap spans many shared bins (width 10 below)
        ("k1", 5, 13, 400.0, 500.0),
        ("k1", 6, 14, 390.0, 495.0),
        # other key: overlaps id 1's range but never joins across keys
        ("k2", 7, 15, 0.0, 100.0),
    ]
    df = spark.createDataFrame(rows, ["k", "id", "u", "s", "e"])
    got = {
        (r["k"], r["id_a"], r["id_b"]): r["overlap"]
        for r in interval_overlap_pairs(
            df, ["k"], "id", "s", "e", bin_width=10.0, distinct_col="u"
        ).collect()
    }
    assert got == {
        ("k1", 1, 2): 0.0,
        ("k1", 5, 6): 95.0,
    }


def test_interval_overlap_pairs_matches_bruteforce(spark, sf_dir):
    """The binning decomposition is exact: operator pairs on the events
    fixture equal a Python brute force of the non-equi predicate, at a
    bin width (7 min) that forces heavy multi-bin replication."""
    from mapreduceproject_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.floor(F.greatest("value", F.lit(0.0)) * 60e6).cast("long")
            ).alias("e"),
        )
    )
    got = {
        (r["event_type"], r["id_a"], r["id_b"], r["overlap"])
        for r in interval_overlap_pairs(
            ev, ["event_type"], "event_id", "s", "e",
            bin_width=420e6, distinct_col="user_id",
        ).collect()
    }
    raw = ev.collect()
    want = set()
    for a in raw:
        for b in raw:
            if (
                a["event_type"] == b["event_type"]
                and a["event_id"] < b["event_id"]
                and a["user_id"] != b["user_id"]
                and a["s"] <= b["e"]
                and b["s"] <= a["e"]
            ):
                want.add(
                    (
                        a["event_type"], a["event_id"], b["event_id"],
                        min(a["e"], b["e"]) - max(a["s"], b["s"]),
                    )
                )
    assert want and got == want


# -- two-phase distributed rank (round-9) ------------------------------------
def test_distributed_rank_matches_global_window(spark):
    """Exactness pin: the range-exchange + per-partition row_number +
    broadcast-offset plan must be bit-identical to the unpartitioned
    global window it replaces, including across range boundaries, for
    any num_partitions (empty ranges included)."""
    from mapreduceproject_spark.operators.ranking import distributed_rank

    # 997 rows, keys engineered so many share the first sort column
    # (exercises the must-not-straddle-tie guarantee on the second)
    rows = [(i * 7919 % 101, f"k{i:04d}", i) for i in range(997)]
    df = spark.createDataFrame(rows, "a int, k string, payload int")
    order = [F.desc("a"), F.asc("k")]
    expected = {
        r["k"]: r["rnk"]
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    for n_parts in (1, 5, 32, 2000):  # 2000 > n_rows: empty ranges
        got = {
            r["k"]: r["rnk"]
            for r in distributed_rank(df, order, num_partitions=n_parts).collect()
        }
        assert got == expected, f"mismatch at num_partitions={n_parts}"


def test_distributed_rank_empty_input(spark):
    from mapreduceproject_spark.operators.ranking import distributed_rank

    df = spark.createDataFrame([], "a int, k string")
    assert distributed_rank(df, [F.desc("a"), F.asc("k")]).count() == 0


def test_customer_rfm_approx_flags_and_axes(spark, sf_dir):
    """Contract: one row per (axis, boundary) with within_rank_bound
    deterministically TRUE, and n_total = exact customer count."""
    from mapreduceproject_spark.plans import QUERIES

    rows = QUERIES["customer_rfm_approx"](spark, sf_dir).collect()
    n_cust = (
        QUERIES["customer_rfm"](spark, sf_dir).select("custkey").distinct().count()
    )
    assert len(rows) == 3 * 4  # 3 axes x (RFM_TILES - 1) boundaries
    assert {r["axis"] for r in rows} == {"recency", "frequency", "monetary"}
    for r in rows:
        assert r["within_rank_bound"] is True
        assert r["n_total"] == n_cust


def test_interval_auto_bin_width_bounds_replication(spark):
    """The auto W's mean/8 floor bounds total bin replication at 9n even
    when one year-long interval sits in a minutes-scale corpus (the
    round-8 verdict's flag), and the auto run's output still equals a
    fixed-width run's (W only shapes the plan, never the pair set)."""
    from mapreduceproject_spark.operators.intervals import (
        AUTO_REPL_CAP,
        auto_bin_width,
        interval_overlap_pairs,
    )

    rows = [("k", i, i, float(i * 100), float(i * 100 + 60)) for i in range(200)]
    rows.append(("k", 999, 999, 0.0, 31_536_000.0))  # one year, seconds
    df = spark.createDataFrame(rows, ["k", "id", "u", "s", "e"])
    w = auto_bin_width(df, "s", "e")
    n_binned = df.select(
        F.sum(
            F.floor(F.col("e") / w).cast("long")
            - F.floor(F.col("s") / w).cast("long")
            + 1
        ).alias("n")
    ).collect()[0]["n"]
    # sum(len)/W <= n*mean/W <= n*CAP, plus one bin each => <= (CAP+1)*n + n
    assert n_binned <= (AUTO_REPL_CAP + 2) * len(rows)
    # with a fixed 1-hour W the year-long row alone explodes to ~8760
    # bins; under auto it stays within the global budget above
    got_auto = {
        (r["id_a"], r["id_b"], r["overlap"])
        for r in interval_overlap_pairs(df, ["k"], "id", "s", "e").collect()
    }
    got_fixed = {
        (r["id_a"], r["id_b"], r["overlap"])
        for r in interval_overlap_pairs(
            df, ["k"], "id", "s", "e", bin_width=3600.0
        ).collect()
    }
    assert got_auto == got_fixed
    # the long interval overlaps every short one (cross-"user")
    assert len(got_auto) == 200


def test_interval_inverted_rows_dropped(spark):
    """end < start is malformed: sequence(s, e) descends for s > e, so an
    unfiltered inverted row would replicate into bins and emit NEGATIVE
    overlaps (a=[10,5] vs b=[0,20] passes sa<=eb AND sb<=ea).  The
    operator drops such rows before the explode."""
    from mapreduceproject_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    rows = [
        ("k", 1, 1, 10.0, 5.0),   # inverted -> dropped
        ("k", 2, 2, 0.0, 20.0),
        ("k", 3, 3, 4.0, 6.0),    # overlaps id 2
    ]
    df = spark.createDataFrame(rows, ["k", "id", "u", "s", "e"])
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in interval_overlap_pairs(
            df, ["k"], "id", "s", "e", bin_width=8.0, distinct_col="u"
        ).collect()
    }
    assert got == {(2, 3): 2.0}
    assert all(v >= 0 for v in got.values())
