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
    # ob feeds four consumers; measured: recomputing it per consumer ties
    # a persist at sf0.1 (each recompute is column-pruned to what that
    # consumer needs, and the distinct's exchange is cheap next to the
    # in-memory store/read cost), so keep the simpler uncached plan.
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    tot = ob.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count("*").cast("long").alias("n"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
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
