"""Warehouse analytics tier: basket affinity, robust statistics, score
calibration, time-decayed aggregates, and information-theoretic corpus
measures.

The reference computes none of these (its reducers are counters,
/root/reference/src/reduce_exe_word_count.go); they are the analysis
queries a warehouse user runs *on top of* the MapReduce surface — and each
one is written for the 100 TB plan shape first (broadcast dims, bounded
self-joins, map-side-combinable sums) and for cross-engine determinism
second.

Determinism discipline (same as plans/stats_queries.py): any value that is
summed across an unordered group is an exact integer or an exact dyadic
rational, never a free-form double — double addition is order-dependent
and Spark's partial/final aggregation order differs from DuckDB's.
Concretely: EWMA weights are 2^-k (shift, not pow), entropy log-terms are
micro-quantized to int64 before the Σ c·ln(c) sum, calibration means sum
micro-quantized qualities.  Doubles appear only in final per-row
expressions evaluated identically by both engines.

Magnitude audit: event cents ≤ 2^15 with weights ≥ 2^-16 → every EWMA
partial sum is exact below 2^53; entropy terms c·⌊ln(c)·1e6⌋ stay under
2^63 to ~1e12 tokens per source; basket lift numerators n_ab·n_orders
stay under 2^63 to ~3e9 orders.  Past those scales the sums switch to
DECIMAL(38) — noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.textfn import duck_token_rows, token_rows
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

# -- market basket: brand co-occurrence lift --------------------------------
BASKET_MIN_PAIR, BASKET_TOP = 5, 15


def _basket_oracle() -> str:
    return f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
    bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM ob GROUP BY 1),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_ab,
           CAST(n_ab AS DOUBLE) / n_orders AS support,
           CAST(n_ab * n_orders AS DOUBLE) / CAST(ca.n * cb.n AS DOUBLE) AS lift
    FROM pairs
    JOIN bc ca ON pairs.brand_a = ca.brand
    JOIN bc cb ON pairs.brand_b = cb.brand
    CROSS JOIN tot
    WHERE n_ab >= {BASKET_MIN_PAIR}
    ORDER BY n_ab DESC, brand_a, brand_b
    LIMIT {BASKET_TOP}
    """


@query("market_basket_lift", oracle=_basket_oracle())
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BASKET_TOP} co-purchased brand pairs with support and lift.

    Plan shape: lineitem joins the part dim via broadcast, collapses to
    distinct (order, brand) — the only fact-sized shuffle — then
    self-joins *on the order key*, so the pair blow-up is bounded by the
    per-order brand count (≤ |brands| = 25), never a global cross
    product.  Brand marginals and the 1-row order total are broadcast.
    Lift is an exact-int64 ratio (n_ab·n_orders < 2^63 to ~3e9 orders;
    DECIMAL(38) beyond) divided once — bit-identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # round 11 (guide §2.4 + §3 exploding joins): ONE order-keyed
    # aggregate collapses the fact stream to a sorted per-order brand set
    # (map-side partial collect_set — the distinct's exchange and the
    # (order,brand)-keyed SELF-JOIN both disappear), and every consumer —
    # the order total (a row count, no exchange at all), the brand
    # marginals (array explode over order-count rows) and the pair tally
    # (in-array i<j combinations; per-order brand sets are bounded by
    # |brands| = 25, so the blow-up stays the self-join's bound without
    # the join) — reads the persisted order-sized array table.
    per_order = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set(F.col("p_brand"))).alias("bs"))
        .persist()
    )
    tot = per_order.agg(F.count("*").cast("long").alias("n_orders"))
    bc = (
        per_order.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").cast("long").alias("n"))
    )
    combos = F.expr(
        "flatten(transform(sequence(1, size(bs) - 1), "
        "i -> transform(sequence(i + 1, size(bs)), "
        "j -> struct(element_at(bs, i) AS brand_a, "
        "element_at(bs, j) AS brand_b))))"
    )
    pairs = (
        per_order.filter(F.size("bs") >= 2)  # sequence(1, 0) would descend
        .select(F.explode(combos).alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_PAIR)
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            (F.col("n_ab").cast("double") / F.col("n_orders")).alias("support"),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "brand_a", "brand_b")
        .limit(BASKET_TOP)
    )


# -- exponentially weighted moving average ----------------------------------
EWMA_LAGS = 16  # weights 2^-1 .. 2^-16: every partial sum exact in a double


def _ewma_oracle() -> str:
    return f"""
    WITH r AS (
      SELECT user_id,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_used,
           (SUM(cents / CAST(1 << rn AS DOUBLE))
             / SUM(1.0 / CAST(1 << rn AS DOUBLE))) / 100.0 AS ewma_value
    FROM r WHERE rn <= {EWMA_LAGS}
    GROUP BY user_id
    """


@query("ewma_user_values", oracle=_ewma_oracle())
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted average (α = 1/2) of the last
    {EWMA_LAGS} event values — the time-decayed feature every online
    scoring pipeline maintains.

    One shuffle on user_id (window rank + regroup); no state, no
    iteration.  Determinism: weights are 2^-rn built by *integer shift*
    (never ``pow``, which is not correctly rounded), values quantized to
    integer cents, so every product and partial sum is an exact dyadic
    rational below 2^53 — summation order cannot change the result.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    r = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EWMA_LAGS)
        .select(
            "user_id",
            F.expr("cents / cast(shiftleft(1L, rn) as double)").alias("term"),
            F.expr("1.0d / cast(shiftleft(1L, rn) as double)").alias("wt"),
        )
    )
    return r.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_used"),
        ((F.sum("term") / F.sum("wt")) / F.lit(100.0)).alias("ewma_value"),
    )


# -- robust statistics: median + MAD ----------------------------------------
def _mad_oracle() -> str:
    return """
    WITH x AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
    m AS (SELECT source, median(x) AS med FROM x GROUP BY 1)
    SELECT x.source,
           CAST(COUNT(*) AS BIGINT) AS n,
           any_value(med) AS med,
           median(abs(x - med)) AS mad
    FROM x JOIN m ON x.source = m.source
    GROUP BY x.source
    """


@query("mad_robust_stats", oracle=_mad_oracle())
def mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source median and median-absolute-deviation of document length
    — the outlier-resistant location/scale pair (variance-based profiling
    is in data_profile; MAD is what survives a heavy-tailed corpus).

    Two grouped exact percentiles with the tiny per-source median table
    broadcast back between them.  Exact across engines: inputs are
    integers, and a percentile interpolation (a+b)/2 of integers is an
    exact dyadic, as is |x − med| — no free-form double sums anywhere.
    """
    x = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    med = x.groupBy("source").agg(F.expr("percentile(x, 0.5D)").alias("med"))
    return (
        x.join(F.broadcast(med), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.first("med").alias("med"),
            F.expr("percentile(abs(x - med), 0.5D)").alias("mad"),
        )
    )


# -- quality-score calibration by decile ------------------------------------
Q_SCALE = 1_000_000


def _calibration_oracle() -> str:
    from mapreduceproject_spark.plans.text_queries import _quality_oracle

    return f"""
    WITH q AS (
      SELECT d.doc_id,
             CAST(d.n_chars AS BIGINT) AS n_chars,
             CAST(floor(t.quality * {Q_SCALE}) AS BIGINT) AS qq
      FROM documents d JOIN ({_quality_oracle()}) t USING (doc_id)
    ),
    b AS (
      SELECT *, CAST(ntile(10) OVER (ORDER BY qq, doc_id) AS BIGINT) AS decile
      FROM q
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(qq) AS DOUBLE) / COUNT(*) / {Q_SCALE} AS avg_quality,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM b GROUP BY decile
    """


@query("quality_calibration_deciles", oracle=_calibration_oracle())
def quality_calibration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table for the heuristic quality score: each
    ntile(10) bucket's size, mean quality, and mean length — how a
    filtering threshold is chosen before running it over the full corpus.

    ntile needs a total order; micro-quantized quality with doc_id
    tiebreak makes bucket boundaries identical across engines.  The
    global sort is decile assignment over (qq, doc_id) pairs only — two
    longs per row, a merge-sort of ~16 bytes/row, not the documents
    themselves; at 100 TB assign buckets from an approx-quantile sketch
    instead (the exact ntile is the calibration oracle, not the hot path).
    Bucket means are exact int64 sums divided once.
    """
    from mapreduceproject_spark.operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    quality = ta.quality_scores(docs, "doc_id", "text").select("doc_id", "quality")
    q = (
        docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .join(quality, "doc_id")
        .select(
            "doc_id",
            "n_chars",
            F.floor(F.col("quality") * Q_SCALE).cast("long").alias("qq"),
        )
    )
    b = q.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy("qq", "doc_id")).cast("long"),
    )
    return b.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("qq").cast("double") / F.count("*") / Q_SCALE).alias("avg_quality"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


# -- pointwise mutual information over adjacent-token bigrams ----------------
PMI_MIN_COUNT, PMI_TOP = 5, 20


def _pmi_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, pos, tok FROM {duck_token_rows("lower(text)", "doc_id")}
    ),
    bg AS (
      SELECT tok AS w1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab FROM bg
      WHERE w2 IS NOT NULL GROUP BY 1, 2
    ),
    tots AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_total FROM c2),
    h AS (
      SELECT w1, w2, n_ab,
             CAST(SUM(n_ab) OVER (PARTITION BY w1) AS BIGINT) AS n_head,
             CAST(SUM(n_ab) OVER (PARTITION BY w2) AS BIGINT) AS n_tail
      FROM c2
    )
    SELECT w1, w2, n_ab, n_head, n_tail,
           ln(CAST(n_ab * n_total AS DOUBLE) / CAST(n_head * n_tail AS DOUBLE))
             AS pmi
    FROM h CROSS JOIN tots
    WHERE n_ab >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP}
    """


@query("token_pmi_bigrams", oracle=_pmi_oracle())
def token_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOP} adjacent-token pairs by pointwise mutual information
    — the collocation detector (multi-word entities, boilerplate phrases)
    that complements bigram_lm_top's raw-frequency view.

    Same linear shape as the bigram LM: one posexplode, one lead()
    window, one bigram groupBy; marginals come from two windows over the
    *bigram table* (vocabulary-sized, not corpus-sized) and the 1-row
    total is broadcast.  PMI's argument is an exact int64 ratio
    (n_ab·N < 2^63 to ~1e9 distinct bigrams × 1e9 tokens) evaluated in
    one identical ln() on both engines; final top-N is TakeOrdered.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = token_rows(
        docs.select("doc_id", "text"), F.lower(F.col("text")), ["doc_id"]
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("w2", F.lead("tok").over(wd))
        .filter(F.col("w2").isNotNull())
        .select(F.col("tok").alias("w1"), "w2")
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("n_ab"))
    tots = c2.agg(F.sum("n_ab").cast("long").alias("n_total"))
    h = c2.withColumn(
        "n_head", F.sum("n_ab").over(Window.partitionBy("w1")).cast("long")
    ).withColumn(
        "n_tail", F.sum("n_ab").over(Window.partitionBy("w2")).cast("long")
    )
    return (
        h.filter(F.col("n_ab") >= PMI_MIN_COUNT)
        .crossJoin(F.broadcast(tots))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_head",
            "n_tail",
            F.log(
                (F.col("n_ab") * F.col("n_total")).cast("double")
                / (F.col("n_head") * F.col("n_tail")).cast("double")
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOP)
    )


# -- per-source token entropy ------------------------------------------------
ENT_SCALE = 1_000_000


def _entropy_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT source, tok
      FROM {duck_token_rows("lower(text)", "doc_id, source")}
    ),
    c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    s AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c * CAST(floor(ln(c) * {ENT_SCALE}) AS BIGINT)) AS BIGINT)
               AS slnq
    FROM c GROUP BY 1
    )
    SELECT source, n_tokens, n_distinct,
           ln(n_tokens) - CAST(slnq AS DOUBLE) / {ENT_SCALE} / n_tokens
             AS entropy_nats
    FROM s
    """


@query("source_token_entropy", oracle=_entropy_oracle())
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each source's token distribution — the
    corpus-diversity gauge (a boilerplate-heavy or template-spam source
    shows up as an entropy cliff next to its peers).

    H = ln(N) − Σc·ln(c)/N over per-(source, token) counts: one corpus
    shuffle to token counts, one vocabulary-sized rollup.  Σc·ln(c) sums
    *doubles* in an unordered group — the order-dependence trap — so
    ln(c) is micro-quantized to int64 first and the sum is exact
    (≤ 2^63 to ~1e12 tokens/source; DECIMAL(38) beyond).  The quantized
    entropy is within 1e-6 nats of exact, deterministically.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = token_rows(
        docs.select("doc_id", "source", "text"),
        F.lower(F.col("text")),
        ["doc_id", "source"],
    )
    c = toks.groupBy("source", "tok").agg(F.count("*").cast("long").alias("c"))
    s = c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(
            F.col("c") * F.floor(F.log("c") * ENT_SCALE).cast("long")
        ).cast("long").alias("slnq"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_distinct",
        (
            F.log("n_tokens")
            - F.col("slnq").cast("double") / ENT_SCALE / F.col("n_tokens")
        ).alias("entropy_nats"),
    )


# -- customer RFM segmentation ----------------------------------------------
RFM_TILES = 5

# the DuckDB CTE for the per-customer rollup, shared by the exact query's
# oracle and the approx twin's
_RFM_BASE_SQL = """
      SELECT o_custkey AS custkey,
             CAST((amax - max(epoch_us(o_orderdate))) // 86400000000 AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders CROSS JOIN (SELECT max(epoch_us(o_orderdate)) AS amax
                              FROM orders) anchor
      GROUP BY o_custkey, amax
"""


def _rfm_base(o: DataFrame) -> DataFrame:
    """Per-customer (recency_days, frequency, monetary_cents) rollup —
    one orders shuffle, broadcast 1-row anchor; shared by customer_rfm
    (exact ntile calibration) and customer_rfm_approx (production)."""
    anchor = F.broadcast(
        o.agg(
            F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
                "amax"
            )
        )
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ous"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .crossJoin(anchor)
        .groupBy("custkey", "amax")
        .agg(
            F.max("ous").alias("last_us"),
            F.count("*").cast("long").alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
        .select(
            "custkey",
            F.expr("(amax - last_us) div 86400000000L").cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )


def _rfm_oracle() -> str:
    return f"""
    WITH base AS ({_RFM_BASE_SQL}),
    scored AS (
      SELECT *,
        CAST(ntile({RFM_TILES}) OVER (ORDER BY recency_days DESC, custkey) AS BIGINT) AS r_score,
        CAST(ntile({RFM_TILES}) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_score,
        CAST(ntile({RFM_TILES}) OVER (ORDER BY monetary_cents, custkey) AS BIGINT) AS m_score
      FROM base
    )
    SELECT custkey, recency_days, frequency,
           CAST(monetary_cents AS DOUBLE) / 100.0 AS monetary,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
    FROM scored
    """


@query("customer_rfm", oracle=_rfm_oracle())
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (exact epoch-µs day count
    vs the global latest order, broadcast 1-row anchor), frequency, and
    monetary value (integer cents), each scored into {RFM_TILES} ntiles
    (higher = better on every axis) and concatenated into the classic
    3-digit segment code.

    One shuffle to the per-customer rollup; the three ntile windows sort
    (key, custkey) pairs only — two longs per customer, not the orders.
    They are still unpartitioned global sorts: at 100 TB (~10⁹
    customers) the production path is customer_rfm_approx (sketch
    boundaries + one conditional-aggregate pass, no global sort); this
    exact formulation remains its calibration oracle, the
    quality_calibration_deciles contract.
    """
    o = load_table(spark, sf_dir, "orders")
    base = _rfm_base(o)
    scored = (
        base.withColumn(
            "r_score",
            F.ntile(RFM_TILES)
            .over(Window.orderBy(F.desc("recency_days"), "custkey"))
            .cast("long"),
        )
        .withColumn(
            "f_score",
            F.ntile(RFM_TILES)
            .over(Window.orderBy("frequency", "custkey"))
            .cast("long"),
        )
        .withColumn(
            "m_score",
            F.ntile(RFM_TILES)
            .over(Window.orderBy("monetary_cents", "custkey"))
            .cast("long"),
        )
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        (F.col("monetary_cents").cast("double") / 100.0).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long")
        .alias("rfm"),
    )


# -- month-over-month revenue growth ----------------------------------------
def _mom_oracle() -> str:
    return """
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT ym, n_orders,
           CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_cents - lag(rev_cents) OVER (ORDER BY ym) AS DOUBLE)
             / lag(rev_cents) OVER (ORDER BY ym) AS mom_growth
    FROM m
    """


@query("orders_mom_growth", oracle=_mom_oracle())
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue trend: per-month order count, revenue
    (exact integer cents) and growth rate vs the previous month — the
    first dashboard of any revenue table.  One month-keyed rollup
    (map-side combined) then a lag window over the month-count-sized
    result; growth is one double division of exact int64 sums.
    """
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.select(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("int")
            .alias("ym"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("ym")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    w = Window.orderBy("ym")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "ym",
        "n_orders",
        (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
        ((F.col("rev_cents") - prev).cast("double") / prev).alias("mom_growth"),
    )


# -- Zipf fit of the token frequency distribution ----------------------------
ZIPF_MAX_RANK = 1000
# milli-quantization, NOT micro: with 1000 ranks, x = ⌊ln(r)·s⌋ gives
# Σx ≈ 5.9e3·s and Σx² ≈ 3.6e7·s², so the normal-equation products
# n·Σx² and (Σx)² reach ~3.6e13·s².  s = 1e6 overflows int64 at ~600
# ranks (the fixture's tiny vocabulary masked it); s = 1e3 bounds every
# product below ~4e19/1e6 ≈ 4e13 — safe with six orders of headroom for
# any count magnitude (y ≤ ln(1e18)·1e3 ≈ 4.2e4 keeps n·Σxy < 3e14).
# Quantization error on the slope is ~1e-4 over the ln-rank spread —
# noise for a corpus-health gauge, and still engine-exact.
LN_SCALE = 1_000


def _zipf_oracle() -> str:
    from mapreduceproject_spark.functions.stats import (
        DUCK_OLS_INTERCEPT_Q,
        DUCK_OLS_R2,
        DUCK_OLS_SLOPE_Q,
        duck_ols_sums,
    )

    return f"""
    WITH tok AS (
      SELECT tok FROM {duck_token_rows("lower(text)", "doc_id")}
    ),
    c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk FROM c
    ),
    q AS (
      SELECT CAST(floor(ln(rnk) * {LN_SCALE}) AS BIGINT) AS x,
             CAST(floor(ln(c) * {LN_SCALE}) AS BIGINT) AS y
      FROM r WHERE rnk <= {ZIPF_MAX_RANK}
    ),
    s AS (SELECT * FROM {duck_ols_sums("q")})
    SELECT n AS n_ranks,
           {DUCK_OLS_SLOPE_Q} AS zipf_slope,
           {DUCK_OLS_INTERCEPT_Q} / {LN_SCALE} AS ln_intercept,
           {DUCK_OLS_R2} AS r2
    FROM s
    """


@query("token_zipf_fit", oracle=_zipf_oracle())
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS of ln(count)
    on ln(rank) over the top {ZIPF_MAX_RANK} terms — slope ≈ −1 is
    natural text; a flat or cliffed curve betrays template spam or
    boilerplate (the corpus-health cousin of source_token_entropy).

    One corpus shuffle to term counts, a TakeOrdered top-{ZIPF_MAX_RANK}
    cut (per-partition heaps + merge — NOT a vocab-wide rank window; at
    a 100-TB corpus the vocabulary is 10⁸+ terms and an unpartitioned
    row_number would sort all of it through one task), a rank window
    over the ≤{ZIPF_MAX_RANK} survivors only,
    then the shared exact-integer sufficient-statistics OLS
    (functions/stats.py — same algebra as grouped_regression; slope is
    a ratio of exact int64 sums, summation order cannot move it).
    Slope needs no rescale (x and y share LN_SCALE); the magnitude
    audit lives on LN_SCALE above.
    """
    from mapreduceproject_spark.functions.stats import ols_outputs, ols_sum_aggs

    docs = load_table(spark, sf_dir, "documents")
    toks = token_rows(
        docs.select("doc_id", "text"), F.lower(F.col("text")), ["doc_id"]
    )
    c = toks.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    # TakeOrdered-limit first, THEN rank the survivors (the
    # bigram_lm_top / dsir_importance_weights discipline): the residual
    # row_number window runs over <= ZIPF_MAX_RANK rows, never the
    # full vocabulary.
    r = (
        c.orderBy(F.desc("c"), "tok")
        .limit(ZIPF_MAX_RANK)
        .withColumn("rnk", F.row_number().over(Window.orderBy(F.desc("c"), "tok")))
    )
    q = r.select(
        F.floor(F.log("rnk") * LN_SCALE).cast("long").alias("x"),
        F.floor(F.log("c") * LN_SCALE).cast("long").alias("y"),
    )
    s = q.agg(*ols_sum_aggs())
    slope_q, intercept_q, r2 = ols_outputs()
    return s.select(
        F.col("n").alias("n_ranks"),
        slope_q.alias("zipf_slope"),
        (intercept_q / LN_SCALE).alias("ln_intercept"),
        r2.alias("r2"),
    )


# -- cross-source shingle overlap -------------------------------------------
OVERLAP_K = 3


def _overlap_oracle() -> str:
    from mapreduceproject_spark.functions.textfn import duck_word_shingles

    return f"""
    WITH ss AS (
      SELECT DISTINCT source, sh FROM (
        SELECT source, unnest({duck_word_shingles("text", OVERLAP_K)}) AS sh
        FROM documents
      )
    ),
    sc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ss GROUP BY 1),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           CAST(n_shared AS DOUBLE)
             / CAST(ca.n + cb.n - n_shared AS DOUBLE) AS jaccard
    FROM inter
    JOIN sc ca ON inter.source_a = ca.source
    JOIN sc cb ON inter.source_b = cb.source
    """


@query("cross_source_shingle_overlap", oracle=_overlap_oracle())
def cross_source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard similarity between sources over distinct
    {OVERLAP_K}-word shingles — the inter-source contamination matrix
    (mirror sites, syndicated content, cross-source boilerplate) that
    dedup_* measures at document level.

    One corpus shuffle to the distinct (source, shingle) set; the
    shingle self-join fans out only where a shingle spans multiple
    sources (≤ |sources|² per shingle, and |sources| is small by
    definition); marginals broadcast.  Jaccard is an exact int64 ratio.
    """
    from mapreduceproject_spark.functions.textfn import word_shingle_rows
    from mapreduceproject_spark.sources.catalog import spread_for_compute

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    # the distinct (source, shingle) set feeds the marginals and BOTH
    # self-join sides; the shingle explode upstream is the expensive part
    # (same recompute trap as the graph census) — persist it once
    ss = (
        word_shingle_rows(docs, F.col("text"), OVERLAP_K, ["doc_id", "source"])
        .select("source", "sh")
        .distinct()
        .persist()
    )
    sc = ss.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a, b = ss.alias("a"), ss.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ca = sc.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    cb = sc.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


# -- equi-depth histogram ----------------------------------------------------
HIST_BUCKETS = 16


def _equidepth_oracle() -> str:
    return f"""
    WITH v AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    b AS (
      SELECT cents,
             CAST(ntile({HIST_BUCKETS}) OVER (
               ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS bucket
      FROM v
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(min(cents) AS DOUBLE) / 100.0 AS lo,
           CAST(max(cents) AS DOUBLE) / 100.0 AS hi
    FROM b GROUP BY bucket
    """


@query("equidepth_histogram", oracle=_equidepth_oracle())
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{HIST_BUCKETS}-bucket equi-depth histogram of l_extendedprice —
    the ANALYZE-statistics primitive behind selectivity estimation
    (data_profile's min/max, this adds the distribution between them).

    Exact formulation: integer cents with a full-key tiebreak make the
    ntile assignment engine-identical; the sort carries three longs per
    row.  At 100 TB the bucket bounds come from approx_percentile and
    the counts from one conditional aggregate — the exact ntile is the
    calibration oracle for that sketch, not the production path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    b = v.withColumn(
        "bucket",
        F.ntile(HIST_BUCKETS)
        .over(Window.orderBy("cents", "l_orderkey", "l_linenumber"))
        .cast("long"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        (F.min("cents").cast("double") / 100.0).alias("lo"),
        (F.max("cents").cast("double") / 100.0).alias("hi"),
    )


# -- last-touch marketing attribution ---------------------------------------
ATTR_WINDOW_DAYS = 7


def _attribution_oracle() -> str:
    return f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    tagged AS (
      SELECT *,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN us END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch_us
      FROM ev
    )
    SELECT COALESCE(CASE WHEN us - touch_us
                              <= {ATTR_WINDOW_DAYS} * 86400000000 THEN touch_type END,
                    'none') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1
    """


@query("attribution_last_touch", oracle=_attribution_oracle())
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click or view within the prior {ATTR_WINDOW_DAYS} days
    ('none' if no touch qualifies), rolled up to channel totals.

    The conditional carry-forward — last(when(is_touch, ...),
    ignorenulls) over the per-user time order — resolves every purchase
    in ONE window pass over one user_id shuffle; the naive formulation
    is a purchases×touches interval self-join that explodes on active
    users.  Timestamps compare as exact epoch-µs integers; revenue sums
    integer cents.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type") != "purchase"
    tagged = ev.withColumn(
        "touch_type",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w),
    ).withColumn(
        "touch_us",
        F.last(F.when(is_touch, F.col("us")), ignorenulls=True).over(w),
    )
    qualified = F.when(
        F.col("us") - F.col("touch_us") <= ATTR_WINDOW_DAYS * 86_400_000_000,
        F.col("touch_type"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(F.coalesce(qualified, F.lit("none")).alias("channel"), "cents")
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        )
    )


# -- skyline / Pareto frontier ----------------------------------------------
def _skyline_oracle() -> str:
    return """
    WITH v AS (
      SELECT p_partkey,
             CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    ),
    m AS (
      SELECT *,
             max(size) OVER (
               ORDER BY price_cents, size DESC, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
      FROM v
    )
    SELECT p_partkey,
           CAST(price_cents AS DOUBLE) / 100.0 AS price,
           size
    FROM m
    WHERE best_prev IS NULL OR size > best_prev
    """


@query("skyline_price_size", oracle=_skyline_oracle())
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: cheapest-for-their-size
    points — every part not dominated by one both cheaper and larger.

    The window formulation solves it in ONE sorted pass: order by
    (price asc, size desc), keep rows whose size beats the running max
    of everything cheaper — no point-vs-point self-join (the naive
    skyline is O(n²)).  The global sort carries three longs per row; at
    100 TB use operators/skyline.py::skyline_2d_two_phase — lossless
    per-bucket local frontiers first, then this same pass over the
    surviving sliver (equality proven in tests/test_analytics_ops.py).
    Exact integer cents; ties fully broken so the frontier is
    engine-identical.
    """
    from mapreduceproject_spark.operators.skyline import skyline_2d

    p = load_table(spark, sf_dir, "part")
    v = p.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    return skyline_2d(v, "price_cents", "size", ["p_partkey"]).select(
        "p_partkey",
        (F.col("price_cents").cast("double") / 100.0).alias("price"),
        "size",
    )


# -- event-type transition matrix -------------------------------------------
def _transition_oracle() -> str:
    return """
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM c
    """


@query("event_transition_matrix", oracle=_transition_oracle())
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    P(next event type | current) — the behavioral fingerprint behind
    next-action prediction and bot detection (a scripted client's matrix
    is near-deterministic; a human's is diffuse).

    One user_id shuffle for the lead() ordering, one |types|²-sized
    count table, marginals from a window over that tiny table.  The
    probability is one exact-int64 ratio per cell.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = s.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").cast("long").alias("n"))
    wt = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias("p"),
    )


# -- batch MERGE INTO semantics (round 4) ------------------------------------
MERGE_SALT = "|merge-v1"
MERGE_BUMP_CENTS = 500  # updates add a flat $5.00 (pure integer arithmetic)


def _merge_oracle() -> str:
    from mapreduceproject_spark.functions.hashing import duck_hash60

    op = duck_hash60(f"CAST(o_orderkey AS VARCHAR) || '{MERGE_SALT}'")
    return f"""
    WITH snap AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             {op} % 10 AS op
      FROM orders
    ),
    merged AS (
      -- unchanged rows
      SELECT k, st, cents FROM snap WHERE op NOT IN (0, 1)
      UNION ALL
      -- updated rows (matched + update)
      SELECT k, st, cents + {MERGE_BUMP_CENTS} FROM snap WHERE op = 0
      -- op = 1 rows are deleted (matched + delete)
      UNION ALL
      -- inserted rows (not matched by source): disjoint negative keys
      SELECT -k, st, cents FROM snap WHERE op = 2
    )
    SELECT st AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM merged GROUP BY st
    """


@query("cdc_merge_apply", oracle=_merge_oracle())
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one distributed plan: a deterministic CDC
    batch (10% updates, 10% deletes, 10% inserts, hash-derived) applied
    to the orders snapshot via full-outer join on the key —
    matched+update takes the source values, matched+delete drops the
    row, not-matched inserts append.  Post-merge per-status row counts
    and exact integer-cents totals are the verifiable output.

    Scale shape: ONE key-partitioned full-outer join (the canonical
    Delta/Iceberg MERGE physical plan before file-level pruning); both
    sides shuffle on the key once, and at a real deployment the
    snapshot side would additionally prune touched files by the change
    batch's key min/max (the zorder_layout_extents machinery).  Cents
    derived with floor(x*100) — cast truncation vs rounding differs
    across engines, floor does not."""
    from mapreduceproject_spark.functions.hashing import hash60

    snap = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    op = hash60(
        F.concat(F.col("k").cast("string"), F.lit(MERGE_SALT))
    ) % 10
    tagged = snap.select("k", "st", "cents", op.alias("op"))
    changes = (
        tagged.filter(F.col("op") == 0)
        .select(
            "k",
            F.lit("update").alias("act"),
            (F.col("cents") + MERGE_BUMP_CENTS).alias("new_cents"),
            F.col("st").alias("new_st"),
        )
        .unionByName(
            tagged.filter(F.col("op") == 1).select(
                "k",
                F.lit("delete").alias("act"),
                F.lit(None).cast("long").alias("new_cents"),
                F.lit(None).cast("string").alias("new_st"),
            )
        )
        .unionByName(
            tagged.filter(F.col("op") == 2).select(
                (-F.col("k")).alias("k"),
                F.lit("insert").alias("act"),
                F.col("cents").alias("new_cents"),
                F.col("st").alias("new_st"),
            )
        )
    )
    merged = (
        snap.join(changes, "k", "full")
        .filter((F.col("act").isNull()) | (F.col("act") != "delete"))
        .select(
            F.coalesce(F.col("new_st"), F.col("st")).alias("st"),
            F.coalesce(F.col("new_cents"), F.col("cents")).alias("cents"),
        )
    )
    return merged.groupBy(F.col("st").alias("o_orderstatus")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# -- approx production twins of the exact-ntile family (round 5) -------------
# quality_calibration_deciles / equidepth_histogram are exact ntile
# formulations whose global sort (two/three longs per row) is the
# CALIBRATION oracle; these twins are the production path at 100 TB —
# approx_percentile bucket bounds + ONE conditional aggregate, no global
# sort anywhere.  Contract (the agg_approx_percentile bound-flag
# pattern): sketch internals are engine/partitioning-specific, so the
# checkable output is per-boundary guarantee flags — the sketch
# boundary's tie-safe rank interval [count_lt+1, count_le] must overlap
# a ±(1% + 1) band around the target rank, two orders of magnitude
# looser than the sketch's ε = 1/accuracy, so the flag is
# deterministically TRUE for any valid execution.
APPROX_HIST_ACC = 10_000


def _approx_boundary_flags_multi(
    values: DataFrame,
    axis_cols: list[tuple[str, str]],
    n_buckets: int,
    cache_values: bool = False,
) -> DataFrame:
    """(axis, boundary, n_total, within_rank_bound) for the n_buckets-1
    interior approx_percentile boundaries of EACH ``(axis, value_col)``
    in ``axis_cols`` — the shared plan shape of the approx-ntile twins:
    ONE sketch aggregate computing every axis's boundary array + non-null
    count, one broadcast of len(axis_cols)·(n_buckets-1) scalars, ONE
    conditional-aggregate pass for all axes, zero global sorts.  n_total
    is per-axis count(value) not count(*): the sketch and the lt/le
    conditional counts all ignore NULLs, so the flag must rank over the
    same population or it drifts FALSE on null-heavy inputs.

    ``cache_values`` persists the narrow projection between the two
    passes.  Decision rule: set it when the values pipeline is EXPENSIVE
    to recompute (quality scoring re-tokenizes the corpus — measured
    19.7 s/pass at the 100× fixture, so the uncached twin cost 2× that
    and lost to the exact query it replaces; customer_rfm_approx's
    rollup re-shuffles orders); leave it off when values come straight
    off a pruned column scan (equidepth's cents — re-scanning one
    parquet column is cheaper than store+read of a corpus-sized cache).
    """
    if cache_values:
        values = values.persist()
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    bound_aggs = []
    for ax, c in axis_cols:
        bound_aggs.append(
            F.percentile_approx(c, probs, F.lit(APPROX_HIST_ACC)).alias(f"_bs_{ax}")
        )
        bound_aggs.append(F.count(F.col(c)).cast("long").alias(f"_n_{ax}"))
    bounds = values.agg(*bound_aggs)
    j = values.crossJoin(F.broadcast(bounds))
    aggs = []
    for ax, c in axis_cols:
        for i in range(1, n_buckets):
            b = F.element_at(F.col(f"_bs_{ax}"), i)
            aggs.append(
                F.sum(F.when(F.col(c) < b, 1).otherwise(0))
                .cast("long")
                .alias(f"_lt_{ax}_{i}")
            )
            aggs.append(
                F.sum(F.when(F.col(c) <= b, 1).otherwise(0))
                .cast("long")
                .alias(f"_le_{ax}_{i}")
            )
    n_cols = [f"_n_{ax}" for ax, _ in axis_cols]
    g = j.groupBy(*n_cols).agg(*aggs)
    rows = g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ax).alias("axis"),
                        F.lit(i).cast("long").alias("b"),
                        F.col(f"_n_{ax}").alias("n"),
                        F.col(f"_lt_{ax}_{i}").alias("lt"),
                        F.col(f"_le_{ax}_{i}").alias("le"),
                    )
                    for ax, _ in axis_cols
                    for i in range(1, n_buckets)
                ]
            )
        ).alias("_s"),
    )
    target = F.col("_s.b") * F.col("_s.n") / n_buckets
    band = F.col("_s.n") / 100.0 + 1
    return rows.select(
        F.col("_s.axis").alias("axis"),
        F.col("_s.b").alias("boundary"),
        F.col("_s.n").alias("n_total"),
        (
            (F.col("_s.lt") + 1 <= target + band)
            & (F.col("_s.le") >= target - band)
        ).alias("within_rank_bound"),
    )


def _approx_boundary_flags(
    values: DataFrame, value_col: str, n_buckets: int, cache_values: bool = False
) -> DataFrame:
    """Single-axis view of :func:`_approx_boundary_flags_multi`:
    (boundary, n_total, within_rank_bound)."""
    return _approx_boundary_flags_multi(
        values, [("v", value_col)], n_buckets, cache_values
    ).drop("axis")


@query(
    "equidepth_histogram_approx",
    oracle=f"""
    SELECT CAST(boundary AS BIGINT) AS boundary,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_total,
           TRUE AS within_rank_bound
    FROM (SELECT unnest(range(1, {HIST_BUCKETS})) AS boundary)
    WHERE EXISTS (SELECT 1 FROM lineitem)
    """,
)
def equidepth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of equidepth_histogram: {HIST_BUCKETS}-bucket
    bounds from a GK sketch (approx_percentile, accuracy
    {APPROX_HIST_ACC}) + one conditional-aggregate pass — replaces the
    exact formulation's global ntile sort (SCALING.md's 'two longs per
    row' caveat, now retired for the production path; the exact query
    remains the calibration oracle).  Output is the per-boundary
    rank-guarantee flag, deterministically TRUE for any valid execution
    (tie-safe interval overlap, see module comment)."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    return _approx_boundary_flags(v, "cents", HIST_BUCKETS)


def _quality_approx_oracle() -> str:
    from mapreduceproject_spark.plans.text_queries import _quality_oracle

    # COUNT(t.quality), not COUNT(*) over documents: n_total is the
    # non-null-quality population the Spark side's sketch and conditional
    # counts rank over (quality is NULL for whitespace-only docs)
    return f"""
    SELECT CAST(boundary AS BIGINT) AS boundary,
           (SELECT CAST(COUNT(t.quality) AS BIGINT)
            FROM ({_quality_oracle()}) t) AS n_total,
           TRUE AS within_rank_bound
    FROM (SELECT unnest(range(1, 10)) AS boundary)
    -- emit boundaries only when the value source has rows: the Spark
    -- builder's conditional-aggregate pass groups over the value rows,
    -- so an empty source yields 0 rows (all-NULL values still yield
    -- n_buckets-1 rows with n_total=0 on BOTH sides)
    WHERE EXISTS (SELECT 1 FROM ({_quality_oracle()}) t2)
    """


@query("quality_calibration_approx", oracle=_quality_approx_oracle())
def quality_calibration_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of quality_calibration_deciles: decile boundaries
    of the micro-quantized quality score from a GK sketch + one
    conditional-aggregate pass over the corpus — no global sort; bucket
    means at 100 TB are then one more conditional aggregate keyed by the
    broadcast boundaries (the exact ntile query remains the calibration
    oracle).  Same per-boundary rank-guarantee flag contract as
    equidepth_histogram_approx."""
    from mapreduceproject_spark.operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    qq = (
        ta.quality_scores(docs, "doc_id", "text")
        .select(
            F.floor(F.col("quality") * Q_SCALE).cast("long").alias("qq")
        )
    )
    return _approx_boundary_flags(qq, "qq", 10, cache_values=True)


# the three RFM score axes; r_score ntiles DESCENDING recency, but the
# DESC-order tile boundaries are the mirrored percentiles of the same
# ascending distribution, so one ascending sketch serves all three axes
RFM_AXES = [
    ("recency", "recency_days"),
    ("frequency", "frequency"),
    ("monetary", "monetary_cents"),
]


def _rfm_approx_oracle() -> str:
    axes = ", ".join(f"'{ax}'" for ax, _ in RFM_AXES)
    return f"""
    WITH base AS ({_RFM_BASE_SQL})
    SELECT axis, CAST(boundary AS BIGINT) AS boundary,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_total,
           TRUE AS within_rank_bound
    FROM (SELECT unnest([{axes}]) AS axis)
    CROSS JOIN (SELECT unnest(range(1, {RFM_TILES})) AS boundary)
    WHERE EXISTS (SELECT 1 FROM base)
    """


@query("customer_rfm_approx", oracle=_rfm_approx_oracle())
def customer_rfm_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of customer_rfm: the {RFM_TILES}-tile boundaries of
    all three RFM axes from ONE multi-column GK sketch aggregate + ONE
    conditional-aggregate pass over the per-customer rollup — no global
    sort anywhere (the exact query's three unpartitioned ntile windows
    each funnel ~10⁹ customers through one task at TPC-H-100-TB; this
    plan is two linear passes over a cached rollup).  Scores at 100 TB
    are then a broadcast-boundaries comparison per row.  Output is the
    per-(axis, boundary) rank-guarantee flag, deterministically TRUE for
    any valid execution — the quality_calibration_approx contract; the
    exact customer_rfm remains the calibration oracle."""
    o = load_table(spark, sf_dir, "orders")
    base = _rfm_base(o).select(*[c for _, c in RFM_AXES])
    return _approx_boundary_flags_multi(base, RFM_AXES, RFM_TILES, cache_values=True)


# -- batch gap sessionization (round 5) ---------------------------------------
# The batch twin of streaming's session_window_stats: split each user's
# event stream into sessions at >SESSION_GAP_MIN-minute silences and
# aggregate per session.  Plan shape: ONE user_id shuffle carries both
# window passes (lag -> new-session flag, running sum -> session index)
# and the per-(user, session) aggregate — never a global sort, and the
# per-user partitions are exactly the natural key distribution, so at
# 100 TB this is a single exchange + linear window scans (the classic
# gaps-and-islands formulation).  Timestamps compare as exact epoch-µs
# integers; revenue sums integer cents (the attribution_last_touch
# discipline).
SESSION_GAP_MIN = 30


def _sessionize_oracle() -> str:
    gap_us = SESSION_GAP_MIN * 60_000_000
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {gap_us}
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS value_sum
    FROM s GROUP BY 1, 2
    """


@query("batch_sessionize", oracle=_sessionize_oracle())
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events table: a session is a
    maximal run of a user's events with no >{SESSION_GAP_MIN}-minute
    silence; output one row per session (start, duration, event count,
    value sum).  See the module comment for the one-shuffle
    gaps-and-islands plan shape."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60_000_000
    lag_us = F.lag("us").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(
            lag_us.isNull() | ((F.col("us") - lag_us) > gap_us), 1
        ).otherwise(0),
    )
    s = flagged.withColumn("session_idx", F.sum("is_new").over(cum))
    return s.groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx")).agg(
        F.min("us").cast("long").alias("start_us"),
        (F.max("us") - F.min("us")).cast("long").alias("duration_us"),
        F.count("*").cast("long").alias("n_events"),
        (F.sum("cents").cast("double") / 100.0).alias("value_sum"),
    )


def _interval_overlap_oracle() -> str:
    # epoch_us / integer microsecond arithmetic end-to-end; the single
    # float division happens once per OUTPUT row in both engines, so the
    # round-6 driver hash sees bit-identical doubles
    return """
    WITH iv AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + CAST(floor(greatest(value, 0) * 60000000.0) AS BIGINT) AS e
      FROM events
    )
    SELECT a.event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS DOUBLE)
             / COUNT(*) AS avg_overlap_us,
           CAST(MAX(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
             AS max_overlap_us
    FROM iv a JOIN iv b
      ON a.event_type = b.event_type
     AND a.event_id < b.event_id
     AND a.user_id <> b.user_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1
    """


@query("interval_overlap_join", oracle=_interval_overlap_oracle())
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user interval-overlap report over events: each event spans
    [ts, ts + value minutes]; count, mean and max overlap (µs) of
    same-type overlapping event pairs from DIFFERENT users.  The pair
    generation is operators/intervals.py::interval_overlap_pairs — the
    bin-replicated EQUI-join (1-hour bins, count-once rule) that replaces
    the cartesian plan a naive non-equi overlap predicate would get; the
    oracle states the same semantics as the direct non-equi join DuckDB's
    IEJoin executes natively."""
    from mapreduceproject_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(
                F.greatest(F.col("value"), F.lit(0.0)) * 60000000.0
            ).cast("long")
        ).alias("e"),
    )
    pairs = interval_overlap_pairs(
        ev,
        key_cols=["event_type"],
        id_col="event_id",
        start_col="s",
        end_col="e",
        bin_width=3_600_000_000.0,
        distinct_col="user_id",
    )
    return pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_overlaps"),
        (F.sum("overlap").cast("double") / F.count("*")).alias(
            "avg_overlap_us"
        ),
        F.max("overlap").cast("long").alias("max_overlap_us"),
    )


# -- frequent session paths (round 9) ------------------------------------------
# The behavioral-mining layer over batch_sessionize's gaps-and-islands:
# which event-type SEQUENCES do sessions actually follow?  Paths are
# capped at the first PATH_MAX_EVENTS events per session (the cap is the
# scale guard: without it an adversarial never-idle user makes one path
# string corpus-sized).  Plan shape: the sessionize user_id exchange
# carries all three window passes (lag → new-session flag, running sum →
# session index, running max → session-start rank, all over the SAME
# partitioning), the cap filter drops everything past rank 8 BEFORE any
# rollup bytes move, then one (user, session) aggregate builds ≤8-element
# paths and one path-keyed count feeds a TakeOrdered top-K — no global
# sort, no collect, partial aggregation on every exchange.
PATH_MAX_EVENTS, PATH_TOP_K = 8, 15


def _session_path_oracle() -> str:
    gap_us = SESSION_GAP_MIN * 60_000_000
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {gap_us}
                  THEN 1 ELSE 0 END AS is_new,
             row_number() OVER w AS rn
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT *,
             SUM(is_new) OVER wc AS session_idx,
             MAX(CASE WHEN is_new = 1 THEN rn END) OVER wc AS start_rn
      FROM flagged
      WINDOW wc AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    p AS (
      SELECT user_id, session_idx,
             string_agg(event_type, '>' ORDER BY us, event_id) AS path
      FROM s WHERE rn - start_rn < {PATH_MAX_EVENTS} GROUP BY 1, 2
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY 1
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP_K}
    """


@query("session_path_topk", oracle=_session_path_oracle())
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOP_K} most-frequent session paths: the '>'-joined
    event-type sequence of each gap-session's first {PATH_MAX_EVENTS}
    events, counted across all sessions.  See the module comment for the
    one-natural-key-exchange plan shape and the path-length cap."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60_000_000
    lag_us = F.lag("us").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(lag_us.isNull() | ((F.col("us") - lag_us) > gap_us), 1).otherwise(0),
    ).withColumn("rn", F.row_number().over(w))
    s = flagged.withColumn("session_idx", F.sum("is_new").over(cum)).withColumn(
        "start_rn",
        F.max(F.when(F.col("is_new") == 1, F.col("rn"))).over(cum),
    )
    paths = (
        s.where(F.col("rn") - F.col("start_rn") < PATH_MAX_EVENTS)
        .groupBy("user_id", "session_idx")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("us", "event_id", "event_type"))
                    ),
                    lambda x: x.getField("event_type"),
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP_K)
    )


# -- OHLC time-bucket downsampling (round 9) ------------------------------------
# The batch candle compactor: per (event_type, hour bucket), open / high /
# low / close / volume over event values — the standard downsampling step
# before charting or coarse-grained modeling, and the batch twin of the
# streaming tumbling aggregates (streaming/jobs.py).  Plan shape: ONE
# group-keyed exchange; open/close ride min/max over a (us, event_id,
# cents) struct — lexicographic struct extrema are algebraic, so the
# partial aggregate compacts every map task to one row per (type, bucket)
# BEFORE the shuffle (the first/last-by-window alternative would exchange
# every raw row twice).  Determinism: extrema keys are exact integer
# (µs, id) pairs — no double enters an order; values sum as integer cents
# (the attribution_last_touch discipline) and divide by 100 once per
# OUTPUT row.
OHLC_BUCKET_US = 3_600_000_000  # 1 hour


def _ohlc_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % {OHLC_BUCKET_US} AS bucket_us,
             epoch_us(ts) AS us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type,
           CAST(bucket_us AS BIGINT) AS bucket_us,
           CAST((min({{'us': us, 'id': event_id, 'c': cents}})).c AS DOUBLE) / 100.0 AS open,
           CAST(max(cents) AS DOUBLE) / 100.0 AS high,
           CAST(min(cents) AS DOUBLE) / 100.0 AS low,
           CAST((max({{'us': us, 'id': event_id, 'c': cents}})).c AS DOUBLE) / 100.0 AS close,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM e GROUP BY 1, 2
    """


@query("events_ohlc_downsample", oracle=_ohlc_oracle())
def events_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, hour) OHLC downsample of event values: open /
    high / low / close / volume / count, with open/close resolved by
    exact (µs, event_id) struct extrema.  See the module comment for the
    one-exchange algebraic plan shape."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (us - us % OHLC_BUCKET_US).alias("bucket_us"),
        us.alias("us"),
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    key = F.struct(
        F.col("us").alias("us"),
        F.col("event_id").alias("id"),
        F.col("cents").alias("c"),
    )
    return e.groupBy("event_type", F.col("bucket_us").cast("long").alias("bucket_us")).agg(
        (F.min(key).getField("c").cast("double") / 100.0).alias("open"),
        (F.max("cents").cast("double") / 100.0).alias("high"),
        (F.min("cents").cast("double") / 100.0).alias("low"),
        (F.max(key).getField("c").cast("double") / 100.0).alias("close"),
        (F.sum("cents").cast("double") / 100.0).alias("volume"),
        F.count("*").cast("long").alias("n_events"),
    )
