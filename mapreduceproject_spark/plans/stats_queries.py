"""In-engine statistics suite: grouped closed-form OLS regression and an
exact-arithmetic correlation matrix.

The reference computes nothing statistical (its reducers are counters,
/root/reference/src/reduce_exe_word_count.go); these are the
sufficient-statistics patterns every warehouse ships — and the interesting
engineering is determinism: covariance sums of DOUBLES are
summation-order-dependent (the exact failure the fixed-point PageRank
rework fixed), so both queries quantize inputs to integers first.  All
sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are then exact 64-bit
sums — order-independent, bit-identical across engines and runs — and the
final slope/intercept/r only touch doubles in one identical expression.

Magnitude audit (why nothing overflows): quality micro-units ≤ 2e6,
n_chars ≤ ~1e4 → Σx·Σy per source < 2^63 up to ~1e7 docs/source;
quantity-cents ≤ 5e3, discount/tax basis points ≤ 1e3 → cross-products
Σxy < 2^63 up to ~1e12 rows.  Columns with large magnitudes
(extendedprice) are deliberately excluded — their cents-products overflow
int64 at ~1e5 rows; at that point you switch to DECIMAL(38) sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

Y_SCALE = 1_000_000  # quality -> micro-units


def _grouped_regression_oracle() -> str:
    from mapreduceproject_spark.functions.stats import (
        DUCK_OLS_INTERCEPT_Q,
        DUCK_OLS_R2,
        DUCK_OLS_SLOPE_Q,
        duck_ols_sums,
    )
    from mapreduceproject_spark.plans.text_queries import _quality_oracle

    return f"""
    WITH q AS (
      SELECT d.doc_id, d.source,
             CAST(d.n_chars AS BIGINT) AS x,
             CAST(floor(t.quality * {Y_SCALE}) AS BIGINT) AS y
      FROM documents d JOIN ({_quality_oracle()}) t USING (doc_id)
      WHERE t.quality IS NOT NULL
    ),
    s AS (SELECT * FROM {duck_ols_sums("q", group_by="source")})
    SELECT source, n,
           {DUCK_OLS_SLOPE_Q} / {Y_SCALE} AS slope,
           {DUCK_OLS_INTERCEPT_Q} / {Y_SCALE} AS intercept,
           {DUCK_OLS_R2} AS r2
    FROM s
    """


@query("grouped_regression", oracle=_grouped_regression_oracle())
def grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source closed-form OLS of quality on document length: slope,
    intercept, r² from one pass of integer sufficient statistics
    (quality micro-quantized so every Σ is an exact 64-bit sum — no
    summation-order nondeterminism).  One shuffle on source; the grouped
    trend-analysis primitive."""
    from mapreduceproject_spark.functions.stats import ols_outputs, ols_sum_aggs
    from mapreduceproject_spark.operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    quality = ta.quality_scores(docs, "doc_id", "text").select("doc_id", "quality")
    # drop NULL-quality docs (empty text) BEFORE the sums: n/sx would
    # otherwise count a row whose y-terms the NULL-skipping SUMs drop —
    # mutually inconsistent sufficient statistics and a silently wrong
    # slope.  Filtered identically in the oracle's q CTE.
    q = (
        docs.select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("x")
        )
        .join(quality, "doc_id")
        .filter(F.col("quality").isNotNull())
        .select(
            "source",
            "x",
            F.floor(F.col("quality") * Y_SCALE).cast("long").alias("y"),
        )
    )
    s = q.groupBy("source").agg(*ols_sum_aggs())
    slope_q, intercept_q, r2 = ols_outputs()
    return s.select(
        "source",
        "n",
        (slope_q / Y_SCALE).alias("slope"),
        (intercept_q / Y_SCALE).alias("intercept"),
        r2.alias("r2"),
    )


# -- exact Pearson correlation matrix ---------------------------------------
# (column, integer scale) — magnitudes audited in the module docstring.
CORR_COLS: tuple[tuple[str, int], ...] = (
    ("l_quantity", 100),
    ("l_discount", 10_000),
    ("l_tax", 10_000),
)


def _corr_oracle() -> str:
    qcols = ", ".join(
        f"CAST(floor({c} * {s}) AS BIGINT) AS {c}" for c, s in CORR_COLS
    )
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c, _ in CORR_COLS:
        sums.append(f"CAST(SUM({c}) AS BIGINT) AS s_{c}")
        sums.append(f"CAST(SUM({c} * {c}) AS BIGINT) AS ss_{c}")
    for i, (a, _) in enumerate(CORR_COLS):
        for b, _s in CORR_COLS[i + 1 :]:
            sums.append(f"CAST(SUM({a} * {b}) AS BIGINT) AS sp_{a}_{b}")
    rows = []
    for i, (a, _) in enumerate(CORR_COLS):
        for b, _s in CORR_COLS[i + 1 :]:
            rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
                f" CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
                f" / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
                f"    * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))) AS pearson_r"
                " FROM s"
            )
    body = "\n    UNION ALL ".join(rows)
    return f"""
    WITH q AS (SELECT {qcols} FROM lineitem),
    s AS (SELECT {", ".join(sums)} FROM q)
    {body}
    """


@query("corr_matrix", oracle=_corr_oracle())
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's bounded-magnitude
    numerics (quantity, discount, tax), computed from one aggregate of
    exact integer sufficient statistics — a single map-side-combined
    pass, then a 3-row unpivot.  The profiling companion to
    data_profile."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        *[
            F.floor(F.col(c) * s).cast("long").alias(c)
            for c, s in CORR_COLS
        ]
    )
    aggs = [F.count("*").cast("long").alias("n")]
    for c, _ in CORR_COLS:
        aggs.append(F.sum(c).cast("long").alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).cast("long").alias(f"ss_{c}"))
    pairs = []
    for i, (a, _) in enumerate(CORR_COLS):
        for b, _s in CORR_COLS[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(b)).cast("long").alias(f"sp_{a}_{b}"))
            pairs.append((a, b))
    s = q.agg(*aggs)
    parts = []
    for a, b in pairs:
        num = (F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(
            "double"
        )
        da = (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
            "double"
        )
        db = (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
            "double"
        )
        parts.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                (num / (F.sqrt(da) * F.sqrt(db))).alias("pearson_r"),
            )
        )
    return s.select(F.explode(F.array(*parts)).alias("p")).select(
        "p.col_a", "p.col_b", "p.n", "p.pearson_r"
    )


# -- chi-square independence test (round 4) ----------------------------------
CHI2_QUANT = 1_000_000  # per-cell term micro-quantization (order-free sum)


@query(
    "chi2_lang_source",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ),
    r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY source),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT cells.lang, cells.source, cells.o, r.r, c.c, t.n,
             CAST(floor(((cells.o - CAST(r.r AS DOUBLE) * c.c / t.n)
                         * (cells.o - CAST(r.r AS DOUBLE) * c.c / t.n)
                         / (CAST(r.r AS DOUBLE) * c.c / t.n)) * {CHI2_QUANT}) AS BIGINT)
               AS term_micro
      FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS BIGINT) AS dof,
           CAST(SUM(term_micro) AS BIGINT) AS chi2_micro,
           sqrt((CAST(SUM(term_micro) AS BIGINT) / {CHI2_QUANT}.0)
                / (ANY_VALUE(n) * least(COUNT(DISTINCT lang) - 1,
                                        COUNT(DISTINCT source) - 1))) AS cramers_v
    FROM terms
    """,
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of the lang × source
    contingency table + Cramér's V effect size — the corpus-composition
    drift check (is language mix independent of source, or does one
    source skew a language?).

    Determinism: observed/marginal counts are exact integers; each
    cell's (o−e)²/e term is computed in identical double arithmetic on
    both engines and micro-quantized to a long BEFORE the sum, so the
    statistic is an order-independent exact integer sum (the
    source_token_entropy discipline).  The cell table is
    |langs|×|sources| — everything after the first groupBy is
    marginal-table-sized, and the marginals re-attach via broadcast-size
    joins."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("o")
    )
    rows = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    cols = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.groupBy().agg(F.sum("o").cast("long").alias("n"))
    # r is widened to double BEFORE the multiply on BOTH engines: the
    # exact r*c int64 product wraps at ~3e9 total rows (Spark wraps
    # silently, DuckDB errors), and e is consumed in double arithmetic
    # anyway — (double)r * (double)c / (double)n is the same IEEE754
    # sequence on both sides, exact whenever r*c < 2^53.
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    term_micro = F.floor(
        ((F.col("o") - e) * (F.col("o") - e) / e) * CHI2_QUANT
    ).cast("long")
    j = (
        cells.join(rows, "lang")
        .join(cols, "source")
        .crossJoin(F.broadcast(tot))
        .select("lang", "source", "o", "r", "c", "n", term_micro.alias("term_micro"))
    )
    nl = F.count_distinct(F.col("lang"))
    ns = F.count_distinct(F.col("source"))
    chi2 = F.sum("term_micro").cast("long")
    return j.agg(
        F.count("*").cast("long").alias("n_cells"),
        nl.cast("long").alias("n_langs"),
        ns.cast("long").alias("n_sources"),
        ((nl - 1) * (ns - 1)).cast("long").alias("dof"),
        chi2.alias("chi2_micro"),
        F.sqrt(
            (chi2 / F.lit(float(CHI2_QUANT)))
            / (F.any_value("n") * F.least(nl - 1, ns - 1))
        ).alias("cramers_v"),
    )


# -- A/B test: Welch two-sample t (round 4) ----------------------------------
AB_SALT = "|ab-v1"
AB_T_CRIT = 1.96  # ~95% two-sided normal approximation


def _ab_oracle() -> str:
    from mapreduceproject_spark.functions.hashing import duck_hash60

    inner = duck_hash60(f"CAST(user_id AS VARCHAR) || '{AB_SALT}'")
    v = f"{inner} % 2"
    return f"""
    WITH x AS (
      SELECT event_type, {v} AS v,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(SUM(CASE WHEN v = 0 THEN cents ELSE 0 END) AS DOUBLE) AS sa1,
             CAST(SUM(CASE WHEN v = 1 THEN cents ELSE 0 END) AS DOUBLE) AS sb1,
             CAST(SUM(CASE WHEN v = 0 THEN cents * CAST(cents AS HUGEINT) ELSE 0 END) AS DOUBLE) AS sa2,
             CAST(SUM(CASE WHEN v = 1 THEN cents * CAST(cents AS HUGEINT) ELSE 0 END) AS DOUBLE) AS sb2
      FROM x GROUP BY event_type
    )
    SELECT event_type, na, nb,
           sa1 / NULLIF(na, 0) AS mean_a_cents,
           sb1 / NULLIF(nb, 0) AS mean_b_cents,
           (sa1 / NULLIF(na, 0) - sb1 / NULLIF(nb, 0))
             / sqrt(((sa2 - sa1 * sa1 / NULLIF(na, 0)) / NULLIF(na - 1, 0)) / NULLIF(na, 0)
                    + ((sb2 - sb1 * sb1 / NULLIF(nb, 0)) / NULLIF(nb - 1, 0)) / NULLIF(nb, 0)) AS t_stat,
           abs((sa1 / NULLIF(na, 0) - sb1 / NULLIF(nb, 0))
             / sqrt(((sa2 - sa1 * sa1 / NULLIF(na, 0)) / NULLIF(na - 1, 0)) / NULLIF(na, 0)
                    + ((sb2 - sb1 * sb1 / NULLIF(nb, 0)) / NULLIF(nb - 1, 0)) / NULLIF(nb, 0))) > {AB_T_CRIT}
             AS significant
    FROM s
    """


@query("ab_test_welch", oracle=_ab_oracle())
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B analysis with Welch's t statistic per event type:
    users deterministically hash-split into variants (assignment at the
    USER level — the unit of randomization — so a user's events never
    straddle arms), then one conditional-aggregation pass builds both
    arms' exact integer sufficient statistics (n, Σcents, Σcents²) and
    the t statistic comes out of identical double arithmetic on both
    engines.  Overflow discipline (SCALING.md known-cliff #5): the
    binding term is (Σcents)², which would wrap int64 at ~1e5 rows per
    (type, arm) worst-case — so the sums accumulate in decimal(38,0) /
    HUGEINT (exact, order-independent) and convert ONCE to double;
    round-to-nearest from the same exact integer is the same double
    everywhere.  One map-side-combined groupBy is the entire plan — the
    classic experiment-analysis query at any scale."""
    from mapreduceproject_spark.functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events")
    v = hash60(
        F.concat(F.col("user_id").cast("string"), F.lit(AB_SALT))
    ) % 2
    x = ev.select(
        "event_type",
        v.alias("v"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    def ncount(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def csum(cond, expr):
        # accumulate in decimal(38,0): the cents^2 per-row term is
        # widened BEFORE the multiply at the call site (a long*long
        # product wraps at |value| ~ $30M) and the SUMS wrap int64 far
        # earlier still — the exact decimal sum converts ONCE to double
        # below, same value on both engines (DuckDB accumulates the
        # HUGEINT twin of the same widened product)
        return F.sum(
            F.when(cond, expr).otherwise(F.lit(0)).cast("decimal(38,0)")
        ).cast("double")

    a, b = F.col("v") == 0, F.col("v") == 1
    s = x.groupBy("event_type").agg(
        ncount(a).alias("na"),
        ncount(b).alias("nb"),
        csum(a, F.col("cents")).alias("sa1"),
        csum(b, F.col("cents")).alias("sb1"),
        csum(
            a, F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("sa2"),
        csum(
            b, F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("sb2"),
    )
    # nullif arm sizes: an event type whose users all hash into one
    # variant (one-user types always do) has na or nb of 0, and a
    # one-event arm has n-1 = 0 — NULL mean/t/significant on both
    # engines, where ANSI would otherwise DIVIDE_BY_ZERO the whole query.
    na_, nb_ = F.nullif(F.col("na"), F.lit(0)), F.nullif(F.col("nb"), F.lit(0))
    ma = F.col("sa1") / na_
    mb = F.col("sb1") / nb_
    va = (F.col("sa2") - F.col("sa1") * F.col("sa1") / na_) / F.nullif(
        F.col("na") - 1, F.lit(0)
    )
    vb = (F.col("sb2") - F.col("sb1") * F.col("sb1") / nb_) / F.nullif(
        F.col("nb") - 1, F.lit(0)
    )
    t = (ma - mb) / F.sqrt(va / na_ + vb / nb_)
    return s.select(
        "event_type",
        "na",
        "nb",
        ma.alias("mean_a_cents"),
        mb.alias("mean_b_cents"),
        t.alias("t_stat"),
        (F.abs(t) > AB_T_CRIT).alias("significant"),
    )


# -- Poisson bootstrap confidence intervals (round 4) ------------------------
# Poisson(1) inverse-CDF thresholds, inlined identically into BOTH engines
# so every (row, replica) draws the same weight.  math.exp(-1) partial
# sums, printed with full double precision.
BOOT_B = 32
BOOT_SALT = "|boot-v1"


def _poisson_thresholds() -> list[float]:
    import math

    out, term, cdf = [], math.exp(-1.0), 0.0
    for k in range(9):
        cdf += term
        out.append(cdf)
        term /= k + 1
    return out


def _boot_weight_sql(u: str) -> str:
    ts = _poisson_thresholds()
    branches = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(ts)
    )
    return f"(CASE {branches} ELSE {len(ts)} END)"


def _boot_params() -> list[tuple[int, int]]:
    """Per-replica universal-hash constants: ONE md5 seed per row, then
    u_b = ((seed mod P)·A_b + B_b mod P)/P — 32 integer ops replace 32
    md5 evaluations (measured 3.9 s → the md5 was the whole cost)."""
    from mapreduceproject_spark.functions.hashing import minhash_params

    return minhash_params(BOOT_B, seed=7)


def _boot_oracle() -> str:
    from mapreduceproject_spark.functions.hashing import MERSENNE_P, duck_hash60

    params = _boot_params()
    a_lit = "[" + ", ".join(str(a) for a, _ in params) + "]"
    b_lit = "[" + ", ".join(str(b) for _, b in params) + "]"
    h = duck_hash60(f"CAST(event_id AS VARCHAR) || '{BOOT_SALT}'")
    u = (
        f"((((seed % {MERSENNE_P}) * ({a_lit})[b + 1] % {MERSENNE_P})"
        f" + ({b_lit})[b + 1]) % {MERSENNE_P} / {float(MERSENNE_P)!r})"
    )
    w = _boot_weight_sql(u)
    return f"""
    WITH x AS (
      SELECT event_type, event_id, {h} AS seed,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    rep AS (
      SELECT event_type, b, cents, CAST({w} AS BIGINT) AS w
      FROM (SELECT x.*, unnest(range(0, {BOOT_B})) AS b FROM x)
    ),
    g AS (
      SELECT event_type, b, CAST(SUM(w * cents) AS BIGINT) AS sw,
             CAST(SUM(w) AS BIGINT) AS nw
      FROM rep GROUP BY event_type, b
    ),
    m AS (SELECT event_type, sw / nw AS mrep FROM g WHERE nw > 0),
    arr AS (
      SELECT event_type, list(mrep ORDER BY mrep) AS a FROM m GROUP BY event_type
    ),
    pt AS (
      SELECT event_type,
             CAST(SUM(cents) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS mean_cents
      FROM x GROUP BY event_type
    )
    SELECT pt.event_type, pt.mean_cents,
           a[least(2, len(a))] AS ci_lo_cents,
           a[greatest(len(a) - 1, 1)] AS ci_hi_cents,
           CAST(len(a) AS BIGINT) AS n_replicas
    FROM pt JOIN arr USING (event_type)
    """


@query("bootstrap_ci_poisson", oracle=_boot_oracle())
def bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google) confidence interval for
    the per-event-type mean: each row gets an independent Poisson(1)
    weight per replica — the canonical DISTRIBUTED resampling, since
    classic bootstrap's fixed-n multinomial draw needs global
    coordination while Poisson weights are a pure per-row map.
    {BOOT_B} replicas, weights drawn by inverse-CDF over a hash-derived
    uniform (thresholds inlined identically in both engines →
    bit-identical draws), CI from the 2nd / {BOOT_B - 1}th order
    statistics of the replica means (~94% coverage at B={BOOT_B}).

    Scale shape: the explode is a deliberate B× row fan-out — the
    documented bootstrap cost everywhere — but all downstream state is
    (type × B) means; no per-replica shuffle of raw data beyond the one
    grouped aggregate, which map-side combines."""
    from mapreduceproject_spark.functions.hashing import hash60

    from mapreduceproject_spark.functions.hashing import MERSENNE_P

    ev = load_table(spark, sf_dir, "events")
    params = _boot_params()
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    x = ev.select(
        "event_type",
        "event_id",
        hash60(
            F.concat(F.col("event_id").cast("string"), F.lit(BOOT_SALT))
        ).alias("seed"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    rep = x.select(
        "event_type",
        "seed",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    u = (
        (F.col("seed") % MERSENNE_P)
        * F.element_at(a_arr, F.col("b") + 1)
        % MERSENNE_P
        + F.element_at(b_arr, F.col("b") + 1)
    ) % MERSENNE_P / F.lit(float(MERSENNE_P))
    ts = _poisson_thresholds()
    expr = F.when(u < ts[0], 0)
    for k, t in enumerate(ts[1:], start=1):
        expr = expr.when(u < t, k)
    w = expr.otherwise(len(ts)).cast("long")
    g = rep.select("event_type", "b", "cents", w.alias("w")).groupBy(
        "event_type", "b"
    ).agg(
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("sw"),
        F.sum("w").cast("long").alias("nw"),
    )
    # a replica whose weights all drew 0 has no resample (nw = 0): its
    # mean is undefined, and a NULL mrep would sort FIRST in Spark's
    # sort_array but LAST in DuckDB's list(ORDER BY) — drop empty
    # replicas on BOTH engines (P(empty) = e^-n per replica, so this
    # only fires for near-empty groups) and index the CI order
    # statistics relative to the surviving count below.
    m = g.filter(F.col("nw") > 0).select(
        "event_type", (F.col("sw") / F.col("nw")).alias("mrep")
    )
    arr = m.groupBy("event_type").agg(
        F.sort_array(F.collect_list("mrep")).alias("a")
    )
    pt = x.groupBy("event_type").agg(
        (F.sum("cents").cast("long") / F.count("*").cast("long")).alias(
            "mean_cents"
        )
    )
    return pt.join(arr, "event_type").select(
        "event_type",
        "mean_cents",
        F.element_at(
            F.col("a"), F.least(F.lit(2), F.size("a"))
        ).alias("ci_lo_cents"),
        F.element_at(
            F.col("a"), F.greatest(F.size("a") - 1, F.lit(1))
        ).alias("ci_hi_cents"),
        F.size("a").cast("long").alias("n_replicas"),
    )
