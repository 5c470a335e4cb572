"""Deep TPC-H query shapes — the decision-support patterns beyond the
round-1 set: EXISTS/NOT-EXISTS correlation, nation-pair multi-joins,
conditional market share, distribution histograms, argmax-by-join, and
disjunctive pushdown predicates.

The reference (SURVEY §2.6 absence list) has none of these; a user would
hand-write multiple maple/juice rounds per join.  Here each is ONE
declarative plan: Catalyst picks broadcast vs shuffle joins per side,
pushes disjunctive predicates into the parquet scan, and runs every
aggregate partial-first.

Determinism discipline (see plans/relational.py): money in DECIMAL(18,4)
until the final cast; correlated "x < frac * avg" predicates are
re-expressed multiplicatively (x * n * k < sum) so both engines compare
exact decimals instead of engine-rounded divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.plans.relational import (
    DEC,
    customer,
    dec,
    lineitem,
    nation,
    orders,
    part,
    region,
    supplier,
)

# -- q4: EXISTS-correlated priority count ------------------------------------
Q4_LAG_DAYS = 60


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LAG_DAYS} DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated count by priority — orders with at
    least one line shipped more than {Q4_LAG_DAYS} days after the order.

    The EXISTS becomes a LEFT SEMI join keyed on orderkey with the lateness
    predicate in the join condition: the fact table is probed once, never
    duplicated (a plain inner join would multiply multi-line orders)."""
    o = orders(spark, sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = lineitem(spark, sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LAG_DAYS} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# -- q7: nation-pair shipping volume -----------------------------------------
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
        OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.

    Join order matters at 100 TB: nation filters broadcast into supplier
    and customer FIRST (each dim shrinks ~1/25 before touching a fact
    table), so the only big shuffles are lineitem⨝orders on orderkey.
    The pair predicate is applied as per-side nation pre-filters plus a
    cheap residual on the joined pair."""
    li = lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pair = ("NATION_0", "NATION_1")
    n = nation(spark, sf_dir).filter(F.col("n_name").isin(*pair))
    s = (
        supplier(spark, sf_dir)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        customer(spark, sf_dir)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# -- q8: market share --------------------------------------------------------
Q8_NATION, Q8_REGION, Q8_TYPE = "NATION_3", "ASIA", "ECONOMY"


@query(
    "q8_market_share",
    oracle=f"""
    SELECT l_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume
                              ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC})) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) nations
    GROUP BY l_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, by year — a 7-table join whose every dimension side broadcasts,
    feeding a conditional-sum ratio.

    The share is a ratio of two decimal sums computed in the SAME
    aggregation (no second pass over the join), cast to double once."""
    li = lineitem(spark, sf_dir)
    p = part(spark, sf_dir).filter(F.col("p_type") == Q8_TYPE).select("p_partkey")
    o = orders(spark, sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    n = nation(spark, sf_dir)
    r = region(spark, sf_dir).filter(F.col("r_name") == Q8_REGION)
    cust_nations = n.join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = (
        customer(spark, sf_dir)
        .join(F.broadcast(cust_nations), F.col("cn_key") == F.col("c_nationkey"))
        .select("c_custkey")
    )
    s = (
        supplier(spark, sf_dir)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    zero = F.lit(0).cast(DEC)
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("l_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("l_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == Q8_NATION, F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


# -- q9: product-line profit by nation and year ------------------------------
Q9_LIKE = "%widget%"


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
                    - CAST(p_retailprice AS {DEC}) * CAST(l_quantity AS {DEC}) * CAST(0.5 AS {DEC}))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '{Q9_LIKE}'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line (name LIKE) per supplier
    nation per year.  The fixtures carry no partsupp/supplycost, so cost is
    modeled as half the part's retail price — the plan shape (LIKE-filtered
    part broadcast pruning lineitem, then orders keyed on orderkey) is the
    point, not the cost model."""
    li = lineitem(spark, sf_dir)
    p = (
        part(spark, sf_dir)
        .filter(F.col("p_name").like(Q9_LIKE))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        supplier(spark, sf_dir)
        .join(
            F.broadcast(nation(spark, sf_dir)),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation_name"))
    )
    o = orders(spark, sf_dir).select("o_orderkey", "o_orderdate")
    amount = dec("l_extendedprice") * (1 - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity") * F.lit(0.5).cast(DEC)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# -- q13: customer order-count distribution ----------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation — orders per customer
    (LEFT join so zero-order customers count), then the histogram of those
    counts.  COUNT(o_orderkey) ignores the NULLs the left join introduces,
    which is exactly how customers with no qualifying orders land in the
    c_count=0 bucket.

    Scale: the first agg shuffles on custkey (same key as the join — one
    exchange serves both), the second shuffles a histogram-sized table."""
    c = customer(spark, sf_dir).select("c_custkey")
    o = orders(spark, sf_dir).filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# -- q15: top supplier by quarterly revenue ----------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax by join — quarterly revenue per supplier,
    keep the supplier(s) hitting the global max.  The max is a 1-row
    aggregate cross-joined (broadcast) back onto the per-supplier rollup;
    revenue stays DECIMAL through the equality so ties are exact, and the
    fact table is aggregated before any join."""
    li = lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = supplier(spark, sf_dir).select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


# -- q17: small-quantity order revenue ---------------------------------------
Q17_BRAND = "Brand#11"


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0 AS DOUBLE)
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS a_partkey,
             SUM(CAST(l_quantity AS {DEC})) AS sum_qty,
             COUNT(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON a_partkey = l_partkey
    WHERE p_brand = '{Q17_BRAND}'
      AND CAST(l_quantity AS {DEC}) * cnt_qty * 5 < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity is below 20% of the part's
    average quantity — the correlated-average predicate.

    The correlation becomes a per-part pre-aggregate joined back to the
    fact table, and the fractional-average compare is re-expressed
    multiplicatively (qty * n * 5 < Σqty) so both engines decide each row
    on exact decimal integers — no division, no rounding divergence.

    Scale: the per-part agg and the fact⨝agg join share the l_partkey
    shuffle key; the brand-filtered part dim broadcasts."""
    li = lineitem(spark, sf_dir)
    p = (
        part(spark, sf_dir)
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count("*").alias("cnt_qty"),
    )
    small = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("a_partkey") == F.col("l_partkey"))
        .filter(dec("l_quantity") * F.col("cnt_qty") * 5 < F.col("sum_qty"))
    )
    return small.agg(
        (F.sum(dec("l_extendedprice")).cast("double") / 7.0)
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("n_small"),
    )


# -- q19: disjunctive pushdown revenue ---------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-AND predicate spanning both join sides.

    Catalyst splits the disjunction: the part-only disjuncts
    (brand ∨ brand ∨ brand, size ≤ 15) and the lineitem-only envelope
    (quantity ∈ [1,30]) are pushed below the join into each scan, with the
    exact cross-side residual evaluated after — the scans read a fraction
    of both tables even though the predicate looks join-wide."""
    li = lineitem(spark, sf_dir)
    p = part(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# -- q21: suppliers who kept orders waiting ----------------------------------
Q21_LATE_DAYS = 90


@query(
    "q21_waiting_suppliers",
    oracle=f"""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lo l1 ON l1.l_suppkey = s_suppkey
    WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l3.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on a multi-supplier order —
    EXISTS (another supplier on the order) and NOT EXISTS (another LATE
    supplier), as LEFT SEMI + LEFT ANTI self-joins on the finished-order
    line set.

    All three legs reuse one cached line set keyed on orderkey, so the
    semi and anti joins co-shuffle with the base — three passes, one
    partitioning.  "Late" is shipdate > orderdate + {Q21_LATE_DAYS}d
    (fixtures carry no commit/receipt dates)."""
    o = orders(spark, sf_dir).filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = lineitem(spark, sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")).alias(
            "is_late"
        ),
    )
    l1 = lo.filter(F.col("is_late"))
    l2 = lo.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = lo.filter(F.col("is_late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = l1.join(
        l2, (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")), "left_semi"
    ).join(
        l3, (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")), "left_anti"
    )
    s = supplier(spark, sf_dir).select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# -- q22: dormant high-balance customers -------------------------------------
@query(
    "q22_dormant_customers",
    oracle=f"""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS {DEC})) AS sum_bal, COUNT(*) AS n_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS nation_key, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS {DEC}) * n_bal > sum_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers richer than the average positive balance
    who have never ordered — scalar-aggregate subquery + NOT EXISTS.

    The global average arrives as a broadcast 1-row aggregate with the
    compare done multiplicatively (bal * n > Σbal: exact decimals, no
    division); NOT EXISTS is a LEFT ANTI join against the orders key set.
    Grouped by nation key (fixtures carry no phone country code)."""
    c = customer(spark, sf_dir)
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("sum_bal"), F.count("*").alias("n_bal")
    )
    o = orders(spark, sf_dir).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal") * F.col("n_bal") > F.col("sum_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# -- q2: minimum-cost supplier per part --------------------------------------
Q2_REGION, Q2_TYPE, Q2_MAX_SIZE = "ASIA", "SMALL", 25


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH rs AS (
      SELECT s_suppkey, s_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = '{Q2_REGION}'
    ),
    cost AS (
      SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS {DEC})) AS supp_cost
      FROM lineitem JOIN rs ON s_suppkey = l_suppkey
      GROUP BY 1, 2
    ),
    mn AS (SELECT l_partkey AS m_partkey, MIN(supp_cost) AS min_cost FROM cost GROUP BY 1)
    SELECT p_partkey, s_name, CAST(supp_cost AS DOUBLE) AS supply_cost
    FROM cost
    JOIN mn ON m_partkey = l_partkey AND supp_cost = min_cost
    JOIN part ON p_partkey = l_partkey
    JOIN rs ON rs.s_suppkey = cost.l_suppkey
    WHERE p_type = '{Q2_TYPE}' AND p_size < {Q2_MAX_SIZE}
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the minimum-cost supplier for each qualifying part —
    the correlated-MIN subquery, decorrelated into a per-(part, supplier)
    pre-aggregate, a per-part MIN, and an exact-decimal equality join back
    (ties keep every minimal supplier, identically on both engines).

    The fixtures carry no partsupp, so supply cost is modeled as the
    supplier's minimum observed line price for the part; the judged shape
    — region-pruned dim chain broadcast into the fact aggregate, argmin
    re-join sharing the partkey shuffle — is unchanged.

    Scale: supplier⨝nation⨝region collapses to a broadcast before the
    fact table is touched; cost/mn/join-back all key on l_partkey, so AQE
    reuses one exchange."""
    r = region(spark, sf_dir).filter(F.col("r_name") == Q2_REGION)
    n = nation(spark, sf_dir).join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    )
    rs = (
        supplier(spark, sf_dir)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name")
    )
    li = lineitem(spark, sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    cost = (
        li.join(F.broadcast(rs), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name")
        .agg(F.min(dec("l_extendedprice")).alias("supp_cost"))
    )
    mn = cost.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supp_cost").alias("min_cost")
    )
    p = (
        part(spark, sf_dir)
        .filter((F.col("p_type") == Q2_TYPE) & (F.col("p_size") < Q2_MAX_SIZE))
        .select("p_partkey")
    )
    return (
        cost.join(
            mn,
            (F.col("m_partkey") == F.col("l_partkey"))
            & (F.col("supp_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("p_partkey", "s_name", F.col("supp_cost").cast("double").alias("supply_cost"))
    )


# -- q11: value-concentration HAVING over a global scalar --------------------
Q11_NATION, Q11_FRACTION_DEN = "NATION_7", 200


@query(
    "q11_important_stock",
    oracle=f"""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_quantity AS {DEC})) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = '{Q11_NATION}'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(val) AS total FROM v)
    SELECT l_partkey AS p_key, CAST(val AS DOUBLE) AS part_value
    FROM v, tot
    WHERE val * {Q11_FRACTION_DEN} > total
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one nation's
    stock value — GROUP BY + HAVING against a global scalar subquery.

    Value is Σ(price·qty) over the nation's line shipments (no partsupp in
    the fixtures).  The global total broadcasts as a 1-row aggregate and
    the fractional HAVING is multiplicative (val·{Q11_FRACTION_DEN} >
    total): exact decimals, no division, no rounding divergence.

    Scale: the per-part aggregate is the only fact shuffle; the total
    derives from it (no second scan) and ships as one row."""
    n = nation(spark, sf_dir).filter(F.col("n_name") == Q11_NATION)
    s = (
        supplier(spark, sf_dir)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey")
    )
    li = lineitem(spark, sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    v = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("val"))
    )
    tot = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val") * Q11_FRACTION_DEN > F.col("total"))
        .select(F.col("l_partkey").alias("p_key"), F.col("val").cast("double").alias("part_value"))
    )


# -- q16: supplier diversity per part attribute, with NOT-IN exclusion -------
Q16_EXCL_BRAND, Q16_EXCL_TYPE = "Brand#15", "PROMO"


@query(
    "q16_parts_supplier_diversity",
    oracle=f"""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_parts_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) — with a NOT-IN supplier exclusion list.

    Supplier-part pairs come from DISTINCT lineitem (no partsupp);
    "complaint" suppliers are modeled as negative account balance.  The
    NOT IN is a LEFT ANTI join (the exclusion list is broadcast-small);
    COUNT(DISTINCT) runs as Spark's two-phase partial-distinct aggregate.

    Scale: the pair-distinct and the grouped distinct both key on partkey
    /suppkey — fact data shuffles twice at most, dims broadcast."""
    li = lineitem(spark, sf_dir).select("l_partkey", "l_suppkey").distinct()
    bad = supplier(spark, sf_dir).filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = (
        part(spark, sf_dir)
        .filter((F.col("p_brand") != Q16_EXCL_BRAND) & (F.col("p_type") != Q16_EXCL_TYPE))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# -- q20: suppliers with concentrated recent shipments -----------------------
Q20_NATION, Q20_LIKE, Q20_YEAR = "NATION_3", "%widget%", 1996


@query(
    "q20_concentrated_suppliers",
    oracle=f"""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CASE WHEN year(l_shipdate) = {Q20_YEAR}
                      THEN CAST(l_quantity AS {DEC}) ELSE CAST(0 AS {DEC}) END) AS qty_year,
             SUM(CAST(l_quantity AS {DEC})) AS qty_total
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_LIKE}')
      GROUP BY 1, 2
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = '{Q20_NATION}'
      AND s_suppkey IN (SELECT l_suppkey FROM sp
                        WHERE qty_year * 2 > qty_total AND qty_year > 0)
    """,
)
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped more than half
    of their all-time volume of LIKE-named parts within a single year —
    the nested IN-subquery chain with a correlated aggregate.

    Both the year-window and all-time quantity sums come from ONE
    conditional aggregate over the part-filtered fact (availqty has no
    fixture analogue); the half-of-total compare is multiplicative exact
    decimal.  The IN chains become broadcast + LEFT SEMI joins.

    Scale: one fact shuffle on (suppkey, partkey); the LIKE-filtered part
    list and the nation-filtered supplier dim both broadcast."""
    p = (
        part(spark, sf_dir)
        .filter(F.col("p_name").like(Q20_LIKE))
        .select("p_partkey")
    )
    li = lineitem(spark, sf_dir).select("l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
    zero = F.lit(0).cast(DEC)
    sp = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == Q20_YEAR, dec("l_quantity")).otherwise(zero)
            ).alias("qty_year"),
            F.sum(dec("l_quantity")).alias("qty_total"),
        )
    )
    qual = (
        sp.filter((F.col("qty_year") * 2 > F.col("qty_total")) & (F.col("qty_year") > 0))
        .select("l_suppkey")
        .distinct()
    )
    n = nation(spark, sf_dir).filter(F.col("n_name") == Q20_NATION)
    return (
        supplier(spark, sf_dir)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(qual, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )
