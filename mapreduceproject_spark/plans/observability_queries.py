"""Warehouse-observability suite: table profiling and event-rate anomaly
detection.

The reference exposes no introspection beyond `ls`/`store` listings
(/root/reference/src/master.go:121-298); a production engine needs a data
profiler (the ANALYZE/stats surface) and rate-anomaly monitoring over its
event stream.  Both are single-pass declarative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

# -- data_profile -----------------------------------------------------------
# (column, kind) — the single source of truth both engines profile from.
PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _profile_oracle() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c, kind in PROFILE_COLS:
        aggs.append(f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_{c}")
        aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}")
        if kind == "num":
            aggs.append(f"CAST(MIN({c}) AS DOUBLE) AS mn_{c}")
            aggs.append(f"CAST(MAX({c}) AS DOUBLE) AS mx_{c}")
        elif kind == "ts":
            aggs.append(f"CAST(epoch_us(MIN({c})) AS DOUBLE) AS mn_{c}")
            aggs.append(f"CAST(epoch_us(MAX({c})) AS DOUBLE) AS mx_{c}")
        else:
            aggs.append(f"MIN({c}) AS mn_{c}")
            aggs.append(f"MAX({c}) AS mx_{c}")
    rows = []
    for c, kind in PROFILE_COLS:
        num = kind in ("num", "ts")
        rows.append(
            f"SELECT '{c}' AS col_name, '{kind}' AS dtype, n_rows,"
            f" nn_{c} AS n_nulls, nd_{c} AS n_distinct,"
            f" {f'mn_{c}' if num else 'CAST(NULL AS DOUBLE)'} AS min_num,"
            f" {f'mx_{c}' if num else 'CAST(NULL AS DOUBLE)'} AS max_num,"
            f" {f'mn_{c}' if not num else 'CAST(NULL AS VARCHAR)'} AS min_str,"
            f" {f'mx_{c}' if not num else 'CAST(NULL AS VARCHAR)'} AS max_str"
            " FROM a"
        )
    body = "\n    UNION ALL ".join(rows)
    return f"""
    WITH a AS (SELECT {", ".join(aggs)} FROM lineitem)
    {body}
    """


@query("data_profile", oracle=_profile_oracle())
def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over lineitem: null count, exact distinct, typed
    min/max (numerics as double, timestamps as epoch-µs, strings as-is)
    — one pruned-scan branch per column, unioned; the stats backbone for
    cost-based planning and data-quality gates."""
    li = load_table(spark, sf_dir, "lineitem")
    # One branch per column, unioned: each branch scans ONLY its column
    # (columnar pruning) and carries a single countDistinct, so Catalyst
    # plans a two-stage partial distinct per branch.  The all-in-one-agg
    # alternative (11 distinct aggregates in one Aggregate) triggers an
    # Expand that multiplies every scanned row 12x — measured 46 s vs ~3 s
    # at sf0.1.
    n_rows = F.broadcast(li.agg(F.count("*").cast("long").alias("n_rows")))
    branches = []
    for c, kind in PROFILE_COLS:
        num = kind in ("num", "ts")
        if kind == "num":
            mn = F.min(c).cast("double")
            mx = F.max(c).cast("double")
        elif kind == "ts":
            mn = F.unix_micros(F.min(c).cast("timestamp")).cast("double")
            mx = F.unix_micros(F.max(c).cast("timestamp")).cast("double")
        else:
            mn = F.min(c)
            mx = F.max(c)
        branches.append(
            li.select(c).agg(
                F.lit(c).alias("col_name"),
                F.lit(kind).alias("dtype"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                (mn if num else F.lit(None).cast("double")).alias("min_num"),
                (mx if num else F.lit(None).cast("double")).alias("max_num"),
                (mn if not num else F.lit(None).cast("string")).alias("min_str"),
                (mx if not num else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.crossJoin(n_rows).select(
        "col_name", "dtype", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


# -- event_anomaly_zscore ---------------------------------------------------
ANOM_TRAIL, ANOM_Z = 7, 2.0


@query(
    "event_anomaly_zscore",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT *,
             AVG(n_events) OVER t AS trail_mean,
             stddev_samp(n_events) OVER t AS trail_sd,
             COUNT(*) OVER t AS trail_n
      FROM c
      WINDOW t AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day_idx, n_events, trail_mean, trail_sd,
           CASE WHEN trail_n >= 2 AND trail_sd > 0
                THEN (n_events - trail_mean) / trail_sd END AS zscore,
           COALESCE(CASE WHEN trail_n >= 2 AND trail_sd > 0
                THEN abs((n_events - trail_mean) / trail_sd) > {ANOM_Z} END,
                FALSE) AS is_anomaly
    FROM w
    """,
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-rate anomaly detection per event type: z-score of each
    day's count against its trailing-{ANOM_TRAIL}-day window (mean +
    sample stddev).  One groupBy and one window over (type, day) — the
    monitoring query that watches a 100 TB/day ingest for silent
    upstream breakage."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))).cast("long")
    c = ev.groupBy(
        "event_type", day.alias("day_idx")
    ).agg(F.count("*").cast("long").alias("n_events"))
    t = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-ANOM_TRAIL, -1)
    )
    w = (
        c.withColumn("trail_mean", F.avg("n_events").over(t))
        .withColumn("trail_sd", F.stddev_samp("n_events").over(t))
        .withColumn("trail_n", F.count("n_events").over(t))
    )
    usable = (F.col("trail_n") >= 2) & (F.col("trail_sd") > 0)
    z = (F.col("n_events") - F.col("trail_mean")) / F.col("trail_sd")
    return w.select(
        "event_type",
        "day_idx",
        "n_events",
        "trail_mean",
        "trail_sd",
        F.when(usable, z).alias("zscore"),
        # never-null boolean: a NULL bool round-trips as pandas NaN on one
        # engine and None on the other, spuriously failing the value hash
        F.coalesce(F.when(usable, F.abs(z) > ANOM_Z), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


# -- running_zscore: per-event online anomaly score (batch twin) ------------


@query(
    "running_zscore",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS c
      FROM events
    ),
    w AS (
      SELECT event_type, event_id, c,
             CAST(COUNT(c) OVER t AS BIGINT) AS n_prior,
             CAST(SUM(c) OVER t AS BIGINT) AS s,
             CAST(SUM(c * c) OVER t AS BIGINT) AS ss
      FROM e
      WINDOW t AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id, c, n_prior,
           CASE WHEN n_prior >= 2
                 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_prior)
                     / (n_prior - 1) > 0
                THEN (c - CAST(s AS DOUBLE) / n_prior)
                     / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_prior)
                            / (n_prior - 1))
           END AS zscore
    FROM w
    """,
)
def running_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event online anomaly score: z of each event's cents value vs
    the running mean/sample-variance of all PRIOR same-type events —
    integer (count, sum, sum-of-squares) prefix accumulators, so the
    batch window here and the custom stateful streaming operator
    (streaming/stateful.py::running_zscore) produce bit-identical scores
    regardless of micro-batch slicing (tests prove the equivalence)."""
    ev = load_table(spark, sf_dir, "events")
    c = F.floor(F.col("value") * 100).cast("long")
    t = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = ev.select(
        "event_type",
        "event_id",
        c.alias("c"),
        "ts",
    ).select(
        "event_type",
        "event_id",
        "c",
        F.count("c").over(t).cast("long").alias("n_prior"),
        F.sum("c").over(t).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(t).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_prior")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n_prior")
    ) / (F.col("n_prior") - 1)
    return w.select(
        "event_type",
        "event_id",
        "c",
        "n_prior",
        F.when((F.col("n_prior") >= 2) & (var > 0), (F.col("c") - mean) / F.sqrt(var)).alias(
            "zscore"
        ),
    )


# -- table_checksums: replica/copy integrity verification -------------------
# The reference re-replicates whole files on membership change and trusts
# the copy (src/master_helpers.go:103-139, no content verification); this
# is the content-level integrity check that design needs: an
# order-independent per-table checksum (bit_xor of canonical row hashes)
# that two replicas — or a pre/post-migration pair — can compare cheaply.
# Canonical row strings use only representation-stable ingredients:
# integers, strings, cents/micro-quantized numerics, epoch-µs timestamps,
# md5 of long text, quantized embedding vectors.

TABLE_KEYS: tuple[tuple[str, str, str], ...] = (
    # (table, spark canonical expr, duckdb canonical expr)
    ("region", "concat_ws('|', r_regionkey, r_name)",
     "concat_ws('|', r_regionkey, r_name)"),
    ("nation", "concat_ws('|', n_nationkey, n_name, n_regionkey)",
     "concat_ws('|', n_nationkey, n_name, n_regionkey)"),
    ("customer",
     "concat_ws('|', c_custkey, c_name, c_nationkey, floor(c_acctbal * 100), c_mktsegment)",
     "concat_ws('|', c_custkey, c_name, c_nationkey, CAST(floor(c_acctbal * 100) AS BIGINT), c_mktsegment)"),
    ("supplier",
     "concat_ws('|', s_suppkey, s_name, s_nationkey, floor(s_acctbal * 100))",
     "concat_ws('|', s_suppkey, s_name, s_nationkey, CAST(floor(s_acctbal * 100) AS BIGINT))"),
    ("part",
     "concat_ws('|', p_partkey, p_name, p_brand, p_type, p_size, floor(p_retailprice * 100))",
     "concat_ws('|', p_partkey, p_name, p_brand, p_type, p_size, CAST(floor(p_retailprice * 100) AS BIGINT))"),
    ("orders",
     "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, floor(o_totalprice * 100), unix_micros(cast(o_orderdate as timestamp)), o_orderpriority)",
     "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, CAST(floor(o_totalprice * 100) AS BIGINT), epoch_us(o_orderdate), o_orderpriority)"),
    ("lineitem",
     "concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey, floor(l_quantity * 100), floor(l_extendedprice * 100), floor(l_discount * 10000), floor(l_tax * 10000), l_returnflag, l_linestatus, unix_micros(cast(l_shipdate as timestamp)))",
     "concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey, CAST(floor(l_quantity * 100) AS BIGINT), CAST(floor(l_extendedprice * 100) AS BIGINT), CAST(floor(l_discount * 10000) AS BIGINT), CAST(floor(l_tax * 10000) AS BIGINT), l_returnflag, l_linestatus, epoch_us(l_shipdate))"),
    ("events",
     "concat_ws('|', event_id, user_id, event_type, unix_micros(cast(ts as timestamp)), floor(value * 100), props)",
     "concat_ws('|', event_id, user_id, event_type, epoch_us(ts), CAST(floor(value * 100) AS BIGINT), props)"),
    ("documents",
     "concat_ws('|', doc_id, md5(text), lang, source, n_chars)",
     "concat_ws('|', doc_id, md5(text), lang, source, n_chars)"),
    ("embeddings",
     "concat_ws('|', vec_id, label, array_join(transform(embedding, x -> cast(floor(cast(x as double) * 1000000) as string)), ','))",
     "concat_ws('|', vec_id, label, array_to_string(list_transform(embedding, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ','))"),
)


def _checksums_oracle() -> str:
    from mapreduceproject_spark.functions.hashing import duck_hash60

    rows = []
    for t, _spark_expr, duck_expr in TABLE_KEYS:
        rows.append(
            f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(bit_xor({duck_hash60(duck_expr)}) AS BIGINT) AS content_xor"
            f" FROM {t}"
        )
    return "\n    UNION ALL ".join(rows)


@query("table_checksums", oracle=_checksums_oracle())
def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum per table (bit_xor of canonical
    row hash60s + row count) — the replica-integrity check the
    reference's re-replication lacks: two copies of a table match iff
    their (n_rows, content_xor) match, computed in one map-side-combined
    pass per table with no shuffle of row data."""
    from mapreduceproject_spark.functions.hashing import hash60

    outs = []
    for t, spark_expr, _duck_expr in TABLE_KEYS:
        df = load_table(spark, sf_dir, t)
        outs.append(
            df.select(hash60(F.expr(spark_expr)).alias("_h")).agg(
                F.lit(t).alias("table_name"),
                F.count("*").cast("long").alias("n_rows"),
                F.expr("bit_xor(_h)").cast("long").alias("content_xor"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# -- join-key skew report (round 4) ------------------------------------------
SKEW_TOP_N = 10


@query(
    "join_key_skew_report",
    oracle=f"""
    WITH f AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS freq
               FROM events GROUP BY 1),
    t AS (SELECT CAST(SUM(freq) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM f),
    top AS (SELECT user_id, freq FROM f ORDER BY freq DESC, user_id LIMIT {SKEW_TOP_N})
    SELECT top.user_id, top.freq, t.n_keys, t.total,
           top.freq / t.total AS share,
           CAST(top.freq AS DOUBLE) * t.n_keys / t.total AS skew_vs_avg,
           CAST((CAST(top.freq AS HUGEINT) * t.n_keys + t.total - 1) // t.total
                AS BIGINT) AS salt_parts
    FROM top, t
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostics for a join/agg key: the top-{SKEW_TOP_N}
    heaviest `events.user_id` keys with their share of all rows, their
    multiple of the average key frequency, and the integer salt factor
    (ceil(freq/avg)) the skew kit (operators/skew.py) would need to
    level them.  This is the report you run BEFORE picking a 100 TB
    join strategy — AQE handles moderate skew at runtime; this surfaces
    the keys that need salting or a broadcast rewrite up front.

    Plan: one map-side-combined groupBy on the key, a 1-row global
    rollup broadcast back, and a TakeOrdered top-k (total order via the
    (freq desc, key asc) tie-break, so the cut is deterministic) — no
    global sort, no collect."""
    ev = load_table(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("freq"))
    tot = freq.groupBy().agg(
        F.sum("freq").alias("total"), F.count("*").alias("n_keys")
    )
    top = freq.orderBy(F.col("freq").desc(), F.col("user_id")).limit(SKEW_TOP_N)
    return top.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "freq",
        "n_keys",
        "total",
        (F.col("freq") / F.col("total")).alias("share"),
        # freq*n_keys is exactly the product that overflows int64 in the
        # heavy-key/high-cardinality regime this report exists to
        # diagnose (freq=2e10 × n_keys=5e8 = 1e19 > 2^63): skew_vs_avg
        # widens to double before the multiply (same IEEE sequence as
        # the oracle), salt_parts stays EXACT via decimal(38,0) /
        # HUGEINT integer ceil-division on the two engines.
        (
            F.col("freq").cast("double") * F.col("n_keys") / F.col("total")
        ).alias("skew_vs_avg"),
        F.expr(
            "(CAST(freq AS DECIMAL(38,0)) * n_keys + total - 1) div total"
        ).alias("salt_parts"),
    )


# -- mergeable-sketch rollup (round 4) ---------------------------------------


@query(
    "hll_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           TRUE AS within_sketch_bound
    FROM events GROUP BY event_type
    """,
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: per-(event_type, day) DataSketches
    HLL sketches of user_id, unioned per event_type — the incremental-
    stats pattern that matters at 100 TB: daily sketch tables roll up
    WITHOUT rescanning history (yesterday's sketches are a few KB each;
    the exact two-phase distinct below rescans everything, and is here
    as the verification side).

    Sketch bytes are engine/partitioning-specific, so the checkable
    contract is the agg_approx_distinct pattern: exact distinct + the
    merged estimate's deviation flag.  lgConfigK=12 gives RSE ~1.6%;
    the 5% + 1 bound is ~3 sigma, deterministically TRUE for any valid
    execution."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
        F.count("*").cast("long").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(rolled, "event_type").select(
        "event_type",
        "n_exact",
        "n_days",
        (
            F.abs(F.col("_est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact") + 1
        ).alias("within_sketch_bound"),
    )


# -- seasonal-profile residual outliers (round 4) ---------------------------
# Cell = (event_type, day-of-week, hour): the weekly seasonality grid.  A
# cell needs SEASONAL_MIN_N observations before its variance is trusted;
# SEASONAL_TOP outliers are reported.  Day-of-week is Spark's convention
# (Sunday=1..Saturday=7); the oracle shifts DuckDB's Sunday=0 by one.
SEASONAL_MIN_N, SEASONAL_TOP = 5, 50


def _seasonal_oracle() -> str:
    return f"""
    WITH x AS (
      SELECT event_id, event_type,
             dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cell AS (
      SELECT event_type, dow, hr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2
      FROM x GROUP BY event_type, dow, hr
    ),
    z AS (
      SELECT x.event_id, x.event_type,
             CAST(x.dow AS BIGINT) AS dow, CAST(x.hr AS BIGINT) AS hr,
             (x.cents - cell.s1 / cell.n)
               / sqrt((cell.s2 - cell.s1 * cell.s1 / cell.n) / (cell.n - 1)) AS z
      FROM x JOIN cell USING (event_type, dow, hr)
      WHERE cell.n >= {SEASONAL_MIN_N}
        AND (cell.s2 - cell.s1 * cell.s1 / cell.n) > 0
    )
    SELECT event_id, event_type, dow, hr, z, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY abs(z) DESC, event_id) AS rnk
          FROM z)
    WHERE rnk <= {SEASONAL_TOP}
    """


@query("seasonal_residual_outliers", oracle=_seasonal_oracle())
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality anomaly detection at the EVENT level: each
    value's z-score against its (event_type, day-of-week, hour) seasonal
    cell, top-{SEASONAL_TOP} by |z| — the seasonal-decomposition residual
    that catches a 3am metric spike a global z-score (running_zscore) or
    a daily-count monitor (event_anomaly_zscore) normalizes away.

    Determinism: cents are floor-quantized, the cell moments accumulate
    in decimal(38,0)/HUGEINT and convert once to double, and z comes out
    of identically-shaped double arithmetic on both engines (the
    ab_test_welch discipline).  Scale: one map-side-combined groupBy to
    the ≤ 168·|types| cell grid, a broadcast join back (statically
    bounded small side), and a TakeOrdered top-{SEASONAL_TOP} — never a
    corpus-wide window."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).cast("double")  # noqa: E731
    cell = x.groupBy("event_type", "dow", "hr").agg(
        F.count("*").cast("long").alias("n"),
        dec("cents").alias("s1"),
        # decimal BEFORE the multiply (mirrors the oracle's HUGEINT-first
        # product): cents*cents in int64 overflows past ~$30M values
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s2"),
    )
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    z = (
        x.join(F.broadcast(cell), ["event_type", "dow", "hr"])
        .filter((F.col("n") >= SEASONAL_MIN_N) & (var_num > 0))
        .select(
            "event_id",
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("hr").cast("long").alias("hr"),
            (
                (F.col("cents") - F.col("s1") / F.col("n"))
                / F.sqrt(var_num / (F.col("n") - 1))
            ).alias("z"),
        )
    )
    top = z.orderBy(F.abs(F.col("z")).desc(), F.asc("event_id")).limit(SEASONAL_TOP)
    w = Window.orderBy(F.abs(F.col("z")).desc(), F.asc("event_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))
