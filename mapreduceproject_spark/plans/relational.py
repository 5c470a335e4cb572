"""Relational core — everything in SURVEY §2.6's absence list, built on
stock DataFrame ops so Catalyst owns the physical plan.

The reference has NO joins, aggregations, windows, sorts, set ops, scalar
functions or SQL (verified absence list, SURVEY §2.6); a user expresses a
join as two hand-written maple rounds.  These queries are the north-star
extension: each one is a single declarative plan that Catalyst compiles to
broadcast/sort-merge joins, partial+final aggregation, and whole-stage
codegen — the physical machinery the reference's single-master shuffle
(src/master.go:518-614) could never reach.

Cross-engine float determinism: monetary math is done in DECIMAL(18,4)
(exact, order-independent, no representable rounding midpoints when cast
from these fixtures' doubles) and cast to DOUBLE only at the very end, so
Spark and DuckDB produce bit-identical aggregates regardless of partial-agg
ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

DEC = "decimal(18,4)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def _t(name):
    """table loader shorthand used by every query below"""
    return lambda spark, sf_dir: load_table(spark, sf_dir, name)


lineitem, orders, customer = _t("lineitem"), _t("orders"), _t("customer")
supplier, nation, region, part, events = (
    _t("supplier"), _t("nation"), _t("region"), _t("part"), _t("events"),
)

Q1_CUTOFF = "2000-09-02 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC})) * (1 + CAST(l_tax AS {DEC}))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregate.

    Plan goals at 100 TB: filter + 7-column projection pushed into the
    parquet scan; partial aggregation before the (tiny, 6-group) exchange.
    """
    li = lineitem(spark, sf_dir)
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    charge = disc_price * (1 + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + top-k.

    customer is orders/lineitem-sized ÷ ~40 → broadcast-able at any SF
    where dims fit executors; the ORDER BY ... LIMIT compiles to
    TakeOrderedAndProject (no global sort at scale).
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cust = customer(spark, sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    ords = orders(spark, sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = lineitem(spark, sf_dir).filter(F.col("l_shipdate") > cutoff)
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN orders   ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join (fact ⋈ 3 dims ⋈ fact) with region filter.

    supplier/nation/region are classic broadcast dims; the only real
    shuffle at scale is lineitem ⋈ orders on orderkey.
    """
    li = lineitem(spark, sf_dir)
    sup, nat, reg = supplier(spark, sf_dir), nation(spark, sf_dir), region(spark, sf_dir)
    ords = orders(spark, sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    dims = F.broadcast(
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg.filter(F.col("r_name") == "ASIA"), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "join_inner_enrich",
    oracle=f"""
    SELECT n_name, COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain inner equi-join chain, dimension-enriched aggregate."""
    ords, cust, nat = orders(spark, sf_dir), customer(spark, sf_dir), nation(spark, sf_dir)
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
        )
    )


@query(
    "join_left_null_extension",
    oracle="""
    SELECT c_custkey, COALESCE(o_cnt, 0) AS order_cnt
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS o_cnt FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
)
def join_left_null_extension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders (null side
    coalesced) — aggregate-before-join keeps the shuffle minimal."""
    cust, ords = customer(spark, sf_dir), orders(spark, sf_dir)
    per_cust = ords.groupBy("o_custkey").agg(F.count("*").alias("o_cnt"))
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey", F.coalesce("o_cnt", F.lit(0)).alias("order_cnt")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS active_customers
    FROM customer WHERE EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 open order."""
    cust, ords = customer(spark, sf_dir), orders(spark, sf_dir)
    open_orders = ords.filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("active_customers"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS inactive_customers
    FROM customer WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no urgent orders."""
    cust, ords = customer(spark, sf_dir), orders(spark, sf_dir)
    urgent = ords.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("inactive_customers"))
    )


@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE) AS revenue,
           COUNT(*) AS line_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim with an explicit broadcast hint — at 100 TB the
    part dim for this schema stays MB-sized, so no shuffle of lineitem."""
    li, p = lineitem(spark, sf_dir), part(spark, sf_dir)
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS order_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst plans it as a two-phase expand+agg."""
    return (
        orders(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count("*").alias("order_cnt"),
        )
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with explicit grouping-flag arithmetic (the
    same formula on both engines, avoiding grouping_id bit-order trivia)."""
    return (
        lineitem(spark, sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("long").alias("gid"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count("*").alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims."""
    return (
        orders(spark, sf_dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast("long").alias("gid"),
            F.count("*").alias("cnt"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "cnt")
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (per-partition
    heap + driver merge of k rows), never a full sort at scale."""
    return (
        orders(spark, sf_dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "set_operations",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS union_cnt,
      (SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS intersect_cnt,
      (SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS except_cnt
    """,
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) in one scalar row.
    The reference's only set-like op is shuffle-file append — a degenerate
    UNION ALL (src/master.go:559)."""
    ords = orders(spark, sf_dir)
    a = ords.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = ords.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        a.union(b).distinct().agg(F.count("*").alias("union_cnt"))
        .crossJoin(a.intersect(b).agg(F.count("*").alias("intersect_cnt")))
        .crossJoin(a.subtract(b).agg(F.count("*").alias("except_cnt")))
    )


@query(
    "window_rank_top3",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal, rn FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    """,
)
def window_rank_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER — the scalable grouped-top-k idiom
    (WindowGroupLimit pushes the k-filter into the sort at scale)."""
    cust, nat = customer(spark, sf_dir), nation(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
    """,
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG over event time per user: inter-event gap in exact microseconds
    (epoch-µs integers sidestep cross-engine date_diff convention drift)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id", "user_id", (micros - F.lag(micros).over(w)).alias("gap_us")
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {DEC})) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer with an explicit ROWS frame (exact
    decimal accumulation → deterministic across engines)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders(spark, sf_dir).select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_slug,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           p_partkey % 7 AS key_mod,
           CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           p_retailprice * 1.1 AS price_with_tax,
           CAST(len(string_split(p_type, ' ')) AS BIGINT) AS type_words
    FROM part
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math/array function surface — all JVM-side builtins
    (the reference pushes every scalar into user executables, SURVEY §2.6)."""
    p = part(spark, sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias("brand_size"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_retailprice") * 1.1).alias("price_with_tax"),
        F.size(F.split("p_type", " ")).cast("long").alias("type_words"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           quarter(o_orderdate) AS order_quarter,
           month(o_orderdate) AS order_month,
           COUNT(*) AS cnt,
           CAST(MIN(o_orderdate + INTERVAL 30 DAY) AS TIMESTAMP) AS min_due,
           CAST(MAX(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS max_month_start
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface: extraction, interval arithmetic, trunc."""
    o = orders(spark, sf_dir)
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("min_due"),
            F.max(F.date_trunc("month", "o_orderdate")).alias("max_month_start"),
        )
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(trunc(TRY_CAST(json_extract_string(props, '$.k')
                                        AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column.

    Parse discipline, identical on both engines: try-parse the extracted
    string as DOUBLE (junk → NULL instead of an ANSI cast error on Spark
    or a hard Conversion Error in DuckDB), then truncate toward zero
    (Spark's double→long cast ≡ DuckDB trunc; a bare DuckDB
    CAST('3.5' AS BIGINT) would round half-even to 4 instead)."""
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(
                F.get_json_object("props", "$.k")
                .try_cast("double")
                .cast("long")
            ).alias("sum_k"),
            F.count("*").alias("cnt"),
        )
    )


@query(
    "asof_join_last_signup",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, s.ts AS last_signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent signup at or
    before it.  Spark lacks a native ASOF operator, so this composes one
    from a union + running last_value(ignorenulls) window — one shuffle by
    user_id, no range explosion, skew-safe (SURVEY §7.2 custom-operator
    path (a): composition of existing DataFrame ops)."""
    ev = events(spark, sf_dir).filter(F.col("event_type").isin("purchase", "signup"))
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("s_ts"),
        # signup sorts before purchase at identical ts → >= semantics
        F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1)).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_signup_ts")
    )


@query(
    "range_join_value_buckets",
    oracle=f"""
    SELECT b.label,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(e.value AS {DEC})) AS DOUBLE) AS value_sum
    FROM events e
    JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
                 ('high', 150.0, 300.0), ('xhigh', 300.0, 1000.0))
         b(label, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.label
    """,
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join against a tiny bucket dim — broadcast nested
    loop, so the fact side streams once with no shuffle."""
    ev = events(spark, sf_dir)
    buckets = ev.sparkSession.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 300.0),
         ("xhigh", 300.0, 1000.0)],
        ["label", "lo", "hi"],
    )
    return (
        ev.join(
            F.broadcast(buckets),
            (ev.value >= buckets.lo) & (ev.value < buckets.hi),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("event_cnt"),
            F.sum(dec("value")).cast("double").alias("value_sum"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_discount AS {DEC})) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate.  Every predicate is
    pushdown-eligible (shows up in the scan's PushedFilters) and the agg
    is a two-phase partial+final sum — the cheapest possible plan class."""
    li = lineitem(spark, sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (F.sum(dec("l_extendedprice") * dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-lang, per-source, grand total in one
    pass) via the SQL surface — Catalyst expands to a single Expand +
    hash-agg plan, one scan instead of three."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_gs")
    return spark.sql(
        """
        SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars) AS chars
        FROM documents_gs
        GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event_type — the sort-based
    exact path (use approx_percentile when a t-digest sketch is acceptable
    at scale; see agg_approx_distinct for the sketch-based pattern)."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.50)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.count("*").alias("n"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           quantile_cont(value, 0.50) AS p50_exact,
           TRUE AS within_rank_bound
    FROM events GROUP BY event_type
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch median per event_type (approx_percentile, accuracy 1e4) —
    the constant-memory quantile that replaces the exact sort at 100 TB.
    Sketch internals are engine/partitioning-specific, so the checkable
    output is the exact median plus a rank-error flag: the sketch answer's
    rank interval [count_lt+1, count_le] must overlap a ±(1% + 1) band
    around the target rank — two orders of magnitude looser than the
    sketch's ε = 1/accuracy guarantee and tie-safe (a heavily duplicated
    median value legitimately spans ranks far past the target), so the
    flag is deterministically TRUE for any valid execution.  Same
    exact-value-plus-guarantee-bound contract as agg_approx_distinct."""
    ev = events(spark, sf_dir)
    acc = 10000
    ap = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(acc)).alias("_ap50"),
        F.percentile("value", F.lit(0.5)).alias("p50_exact"),
        F.count("*").alias("n"),
    )
    ranked = (
        ev.join(ap, "event_type")
        .groupBy("event_type", "n", "p50_exact", "_ap50")
        .agg(
            F.sum(
                F.when(F.col("value") <= F.col("_ap50"), 1).otherwise(0)
            ).alias("_le"),
            F.sum(
                F.when(F.col("value") < F.col("_ap50"), 1).otherwise(0)
            ).alias("_lt"),
        )
    )
    # tie-safe rank check: the sketch's answer x occupies the whole rank
    # INTERVAL [count_lt(x)+1, count_le(x)] — with heavy duplicates,
    # count_le alone can legitimately sit far past the target rank even
    # when the sketch is exact, so the flag tests interval OVERLAP with
    # [0.5n - bound, 0.5n + bound] instead of a single-point distance.
    bound = F.col("n") / 100.0 + 1
    return ranked.select(
        "event_type",
        "n",
        "p50_exact",
        (
            (F.col("_lt") + 1 <= 0.5 * F.col("n") + bound)
            & (F.col("_le") >= 0.5 * F.col("n") - bound)
        ).alias("within_rank_bound"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_rsd_bound
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event_type — the constant-memory
    sketch that replaces exact COUNT(DISTINCT) at 100 TB.  The raw sketch
    value is engine-specific, so the checkable output is the exact count
    plus a deterministic ``within_rsd_bound`` flag: |HLL − exact|/exact
    must sit inside 5× the requested rsd (0.02 → 10%), a bound HLL++
    misses with probability ≈ 6e-7.  The oracle emits the same exact
    count and literal TRUE, making the sketch's accuracy — not its
    internal registers — the contract under test."""
    ev = events(spark, sf_dir)
    # dedup first, then plain count + HLL: a combined COUNT(DISTINCT) +
    # approx agg plans through Expand (row duplication per agg path),
    # while HLL registers are max-of-hashes and therefore identical over
    # the deduped set — same value, ~3× less work
    dedup = ev.select("event_type", "user_id").distinct()
    return dedup.groupBy("event_type").agg(
        F.count("*").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_hll") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.10)
        ).alias("within_rsd_bound"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT event_id, event_type,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(event_id) OVER w AS first_ev,
           nth_value(event_id, 2) OVER w AS second_ev
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY CAST(floor(value*100) AS BIGINT), event_id)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: PERCENT_RANK and CUME_DIST (exact
    rank/(n−1) and rank/n rationals — engine-identical given the
    fully-deterministic (cents, id) order), plus FIRST_VALUE/NTH_VALUE
    under the default running frame.  One shared window spec = one
    shuffle+sort serves all four."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.floor(F.col("value") * 100).cast("long"), "event_id"
    )
    return ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("event_id").over(w).alias("first_ev"),
        F.nth_value("event_id", 2).over(w).alias("second_ev"),
    )


@query(
    "window_frames",
    oracle=f"""
    SELECT event_id, event_type,
           DENSE_RANK() OVER (PARTITION BY event_type ORDER BY CAST(floor(value*100) AS BIGINT) DESC) AS drnk,
           NTILE(4) OVER (PARTITION BY event_type ORDER BY CAST(floor(value*100) AS BIGINT) DESC, event_id) AS quartile,
           LEAD(event_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS next_event,
           CAST(SUM(CAST(floor(value*100) AS BIGINT)) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_3
    FROM events
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function round-out: DENSE_RANK, NTILE, LEAD, and an explicit
    sliding ROWS frame — all on integer cents so every engine agrees.
    One partition-shuffle serves all four functions (shared window spec)."""
    ev = events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100).cast("long")
    by_val = Window.partitionBy("event_type").orderBy(F.desc(cents))
    by_val_t = Window.partitionBy("event_type").orderBy(F.desc(cents), F.asc("event_id"))
    by_time = Window.partitionBy("event_type").orderBy("ts", "event_id")
    sliding = by_time.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "event_type",
        F.dense_rank().over(by_val).alias("drnk"),
        F.ntile(4).over(by_val_t).alias("quartile"),
        F.lead("event_id").over(by_time).alias("next_event"),
        F.sum(cents).over(sliding).alias("cents_3"),
    )


def _array_functions_oracle() -> str:
    # built from duck_tokens (NOT a hand-inlined tokenizer) so the shared
    # tokenizer's semantics — including the NULL-text coalesce — can never
    # drift between this oracle and the Spark side
    from mapreduceproject_spark.functions.textfn import duck_tokens

    t = duck_tokens("text")
    return f"""
    SELECT doc_id,
           CAST(len(list_distinct({t})) AS BIGINT) AS n_unique,
           list_sort(list_distinct({t}))[1] AS first_tok,
           list_sort(list_distinct({t}))[-1] AS last_tok,
           list_contains({t}, 'the') AS has_the
    FROM documents
    """


@query("array_functions", oracle=_array_functions_oracle())
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: distinct, sort, element access, membership —
    per-row JVM expressions, no shuffle (reference has no array type at
    all, SURVEY §1.2)."""
    from mapreduceproject_spark.functions.textfn import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    uniq = F.array_sort(F.array_distinct(toks))
    # F.get (NULL out-of-bounds) not element_at: a zero-token document has
    # an empty array and element_at would THROW under ANSI; DuckDB's
    # list[1] / list[-1] on an empty list is NULL, matching F.get.
    return docs.select(
        "doc_id",
        F.size(uniq).cast("long").alias("n_unique"),
        F.get(uniq, 0).alias("first_tok"),
        F.get(uniq, F.size(uniq) - 1).alias("last_tok"),
        F.array_contains(toks, "the").alias("has_the"),
    )


@query(
    "correlated_above_brand_avg",
    oracle=f"""
    SELECT p_partkey, p_brand,
           CAST(CAST(p_retailprice AS {DEC}) AS DOUBLE) AS price
    FROM part p
    WHERE CAST(p_retailprice AS {DEC}) > (
      SELECT AVG(CAST(p2.p_retailprice AS {DEC}))
      FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def correlated_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (parts priced above their brand's
    average).  Spark decorrelates this into the same plan as the explicit
    window/self-agg form — written here as a window avg so the DataFrame
    API stays single-pass; the oracle keeps the correlated form to prove
    the semantics line up."""
    p = part(spark, sf_dir)
    w = Window.partitionBy("p_brand")
    price = dec("p_retailprice")
    return (
        p.select(
            "p_partkey",
            "p_brand",
            price.alias("_p"),
            F.avg(price).over(w).alias("_avg"),
        )
        .filter(F.col("_p") > F.col("_avg"))
        .select("p_partkey", "p_brand", F.col("_p").cast("double").alias("price"))
    )


@query(
    "null_semantics",
    oracle="""
    WITH x AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS st,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS pr
      FROM orders
    )
    SELECT st, pr IS NOT DISTINCT FROM st AS null_safe_eq,
           COUNT(*) AS n,
           COUNT(st) AS n_nonnull,
           COALESCE(MIN(pr), 'none') AS min_pr
    FROM x GROUP BY st, null_safe_eq
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: null-generating CASE, null-safe equality
    (<=> / IS NOT DISTINCT FROM), COUNT(col) vs COUNT(*), COALESCE — the
    semantics corner where engines classically diverge, pinned equal."""
    o = orders(spark, sf_dir)
    x = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("st"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("pr"),
    )
    return (
        x.withColumn("null_safe_eq", F.col("pr").eqNullSafe(F.col("st")))
        .groupBy("st", "null_safe_eq")
        .agg(
            F.count("*").alias("n"),
            F.count("st").alias("n_nonnull"),
            F.coalesce(F.min("pr"), F.lit("none")).alias("min_pr"),
        )
    )


PIVOT_STATUSES = ["F", "O", "P"]


@query(
    "pivot_status_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(f"COUNT(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s}" for s in PIVOT_STATUSES)}
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status as columns.  Explicit
    value list (PIVOT_STATUSES) — at scale an unlisted pivot forces an
    extra distinct-values job, so the list is part of the contract."""
    out = (
        orders(spark, sf_dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .count()
    )
    # pivot leaves null where a (priority, status) cell has no rows; the
    # oracle's FILTER-count yields 0 — align on 0
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in PIVOT_STATUSES],
    )


@query(
    "unpivot_quality_metrics",
    oracle="""
    SELECT doc_id, metric, val FROM (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) AS chars,
             CAST(length(text) AS DOUBLE) AS text_len
      FROM documents
    ) UNPIVOT (val FOR metric IN (chars, text_len))
    """,
)
def unpivot_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-doc metrics to long (doc_id, metric, val) —
    the shape metric stores and plotting pipelines want.  Pure per-row
    expansion, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("chars"),
        F.length("text").cast("double").alias("text_len"),
    )
    return docs.unpivot("doc_id", ["chars", "text_len"], "metric", "val")


@query(
    "q10_returned_item_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 3-way fact join + dim broadcast, filtered agg,
    top-20.  Catalyst pushes both filters to the scans, broadcasts
    nation, and the final top-k is a TakeOrderedAndProject."""
    li, o, c, n = (
        lineitem(spark, sf_dir),
        orders(spark, sf_dir),
        customer(spark, sf_dir),
        nation(spark, sf_dir),
    )
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_late_shipments",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lineitems,
           COUNT(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY) AS n_late,
           CAST(COUNT(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY) AS DOUBLE)
             / COUNT(*) AS late_ratio
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — fixtures carry no shipmode): late-
    shipment ratios per priority via conditional aggregation over the
    orders⨝lineitem join; one fact shuffle, FILTER-style aggs fuse into a
    single pass."""
    li, o = lineitem(spark, sf_dir), orders(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    n_late = F.sum(F.when(late, 1).otherwise(0))
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            n_late.alias("n_late"),
            (n_late.cast("double") / F.count("*")).alias("late_ratio"),
        )
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: per stage, the earliest event
    strictly after the previous stage's first event.  Three
    filtered-min aggregations chained by user-keyed joins — each stage's
    frame shrinks, so the heavy scan happens once per stage with the
    event_type filter pushed down."""
    ev = events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_k
      FROM events e JOIN first f ON f.user_id = e.user_id
    )
    SELECT cohort, week_k, COUNT(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, counted
    in each subsequent active week — first-touch agg, broadcast back,
    distinct (user, week) dedup, final count; all week arithmetic on
    aligned date_trunc boundaries so the integer division is exact."""
    ev = events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
            )
            .cast("long")
            .alias("week_k"),
        )
        .distinct()
    )
    return act.groupBy("cohort", "week_k").agg(F.count("*").alias("n_users"))


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' OR p_name LIKE '%promo%'
                            THEN CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
                            ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS promo_share_pct,
           COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share over a fact⨝dim join
    with a LIKE predicate — part broadcasts, the conditional sums run in
    one pass (decimal-exact ratio, cast to double at the very end)."""
    li, p = lineitem(spark, sf_dir), part(spark, sf_dir)
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = (F.col("p_type").like("PROMO%")) | (F.col("p_name").like("%promo%"))
    zero = F.lit(0).cast(DEC)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                (F.lit(100.0) * F.sum(F.when(promo, rev).otherwise(zero)).cast("double"))
                / F.sum(rev).cast("double")
            ).alias("promo_share_pct"),
            F.count("*").alias("n_lineitems"),
        )
    )


Q18_QTY_THRESHOLD = 170


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(sum_qty AS {DEC}) AS DOUBLE) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS {DEC})) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {DEC})) > {Q18_QTY_THRESHOLD}
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate drives the join order —
    aggregate lineitem FIRST (the big table shrinks to qualifying orders),
    then join the small survivor set to orders/customer.  The
    aggregate-before-join is the key scale decision; joining first would
    shuffle the full fact table twice."""
    li, o, c = lineitem(spark, sf_dir), orders(spark, sf_dir), customer(spark, sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "agg_variance_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mean_value,
           (CAST(SUM(CAST(value AS {DEC}) * CAST(value AS {DEC})) AS DOUBLE)
              - CAST(SUM(CAST(value AS {DEC})) AS DOUBLE)
                * CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1) AS var_value
    FROM events GROUP BY event_type
    """,
)
def agg_variance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance via exact decimal Σx / Σx² (the order-independent
    formulation) — the built-in stddev/variance is a float stream whose
    result depends on partial-agg order, so it can never hash-match an
    oracle; decimal moments can, and the two-pass-free formula is also
    the scalable one (single aggregation, no centering pass)."""
    ev = events(spark, sf_dir)
    sx = F.sum(dec("value"))
    sxx = F.sum(dec("value") * dec("value"))
    n = F.count("*")
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (sx.cast("double") / n).alias("mean_value"),
        (
            (sxx.cast("double") - sx.cast("double") * sx.cast("double") / n)
            / (n - F.lit(1))
        ).alias("var_value"),
    )


@query(
    "error_context_window",
    oracle="""
    SELECT e.event_id AS error_id,
           COUNT(x.event_id) AS n_prior_5min
    FROM events e
    LEFT JOIN events x
      ON x.user_id = e.user_id
     AND x.ts >= e.ts - INTERVAL 5 MINUTE
     AND x.ts < e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def error_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval self-join: for every error event, how many events the
    same user produced in the preceding 5 minutes — the incident-context
    shape.  The user_id equi-key carries the shuffle; the time band
    filters inside each user's partition, so cost is per-user-density,
    not corpus²."""
    ev = events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("eu"),
        F.col("ts").alias("ets"),
    )
    others = ev.select(
        F.col("event_id").alias("xid"), F.col("user_id").alias("xu"), F.col("ts").alias("xts")
    )
    joined = errors.join(
        others,
        (F.col("xu") == F.col("eu"))
        & (F.col("xts") >= F.col("ets") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("xts") < F.col("ets")),
        "left",
    )
    return joined.groupBy("error_id").agg(F.count("xid").alias("n_prior_5min"))


@query(
    "events_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))::DATE AS d
      FROM daily GROUP BY user_id
    ),
    joined AS (
      SELECT s.user_id, s.d, daily.n_events, daily.cents
      FROM spine s LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d
    ),
    grp AS (
      SELECT *, COUNT(cents) OVER (PARTITION BY user_id ORDER BY d
                                   ROWS UNBOUNDED PRECEDING) AS g
      FROM joined
    )
    SELECT user_id, CAST(d AS TIMESTAMP) AS d, COALESCE(n_events, 0) AS n_events,
           MAX(cents) OVER (PARTITION BY user_id, g) AS cents_filled,
           n_events IS NULL AS is_gap
    FROM grp
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a daily spine per user (first→last active
    day) left-joined to daily totals, missing days forward-filled with the
    most recent day's cents — the resample/ffill primitive.

    Forward fill avoids engine-specific IGNORE NULLS: a running count of
    non-null days forms islands (each island starts at a real day), and a
    per-island MAX propagates that day's value — identical semantics on
    any engine with standard window frames.

    Scale: the spine explodes to (active span in days) rows per user —
    output-proportional, never corpus²; both windows share the user_id
    shuffle, and the daily pre-aggregate is the only pass over raw
    events."""
    ev = events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
        )
    )
    joined = spine.join(daily, ["user_id", "d"], "left")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = joined.withColumn("g", F.count("cents").over(w_run))
    w_island = Window.partitionBy("user_id", "g")
    return grp.select(
        "user_id",
        F.col("d").cast("timestamp_ntz").alias("d"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.max("cents").over(w_island).alias("cents_filled"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(o.k, e.k) AS user_key,
           COALESCE(o_cnt, 0) AS order_cnt,
           COALESCE(e_cnt, 0) AS event_cnt,
           o.k IS NULL AS only_events,
           e.k IS NULL AS only_orders
    FROM (SELECT o_custkey AS k, COUNT(*) AS o_cnt FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00' GROUP BY 1) o
    FULL OUTER JOIN
         (SELECT user_id AS k, COUNT(*) AS e_cnt FROM events
          WHERE event_type = 'purchase' GROUP BY 1) e
      ON o.k = e.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join completing the join-type matrix: late-1997 order
    counts vs purchase-event counts per user, keeping keys present on
    EITHER side with null-extension flags both ways.

    Aggregate-before-join shrinks both inputs to key cardinality before
    the full-outer shuffle (a full outer can never broadcast — both
    sides' unmatched rows must survive — so pre-aggregation is the only
    lever, and both aggs share the join's hash partitioning)."""
    o = (
        orders(spark, sf_dir)
        .filter(F.col("o_orderdate") >= "1997-06-01")
        .groupBy(F.col("o_custkey").alias("ok"))
        .agg(F.count("*").alias("o_cnt"))
    )
    e = (
        events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("ek"))
        .agg(F.count("*").alias("e_cnt"))
    )
    return o.join(e, F.col("ok") == F.col("ek"), "full_outer").select(
        F.coalesce("ok", "ek").alias("user_key"),
        F.coalesce("o_cnt", F.lit(0)).alias("order_cnt"),
        F.coalesce("e_cnt", F.lit(0)).alias("event_cnt"),
        F.col("ok").isNull().alias("only_events"),
        F.col("ek").isNull().alias("only_orders"),
    )


# -- SCD Type-2 dimension build (gaps-and-islands) --------------------------


@query(
    "scd2_intervals",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_idx,
             event_type
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    islands AS (
      SELECT *, day_idx - row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY day_idx) AS grp
      FROM daily
    )
    SELECT user_id, event_type,
           MIN(day_idx) AS valid_from_day,
           MAX(day_idx) AS valid_to_day,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM islands GROUP BY user_id, event_type, grp
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: each user's last event type per day
    becomes the tracked attribute; consecutive same-value days merge into
    validity intervals via the gaps-and-islands trick (day_idx minus
    per-value row_number is constant within a run).  One shuffle on
    user_id carries every window; the warehouse pattern for slowly
    changing dimensions, no MERGE engine required."""
    ev = events(spark, sf_dir)
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))).cast("long")
    wd = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("user_id", day.alias("day_idx"), "event_type")
    )
    wi = Window.partitionBy("user_id", "event_type").orderBy("day_idx")
    islands = daily.withColumn(
        "grp", F.col("day_idx") - F.row_number().over(wi)
    )
    return (
        islands.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("day_idx").alias("valid_from_day"),
            F.max("day_idx").alias("valid_to_day"),
            F.count("*").cast("long").alias("n_days"),
        )
        .drop("grp")
    )
