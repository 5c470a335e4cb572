"""Corpus-curation suite over the documents table: the training-data
pipeline stages between raw text and shard writing — repetition filters,
benchmark decontamination, token-budget packing, stratified sampling,
per-source rollups.  Every oracle replicates the operator's exact
algorithm (same tokenizer, same hash60, same integer arithmetic) for
bit-exact parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceproject_spark.functions.hashing import duck_hash60, hash60
from mapreduceproject_spark.functions.textfn import (
    duck_tokens,
    duck_word_shingles,
    tokens,
)
from mapreduceproject_spark.operators import curation as cu
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

# -- parameters pinned identically in Spark code and oracle SQL -------------
REP_TOP_MAX, REP_BI_MAX, REP_TRI_MAX = 0.2, 0.4, 0.3
DECONTAM_K, BENCH_SALT, BENCH_PCT = 5, "|bench-v1", 95
PACK_CAPACITY, PACK_BUCKETS = 256, 8
STRAT_RATES = {"en": 25, "de": 80, "es": 70, "fr": 80, "zh": 60}
STRAT_DEFAULT, STRAT_SALT = 50, "|strat-v1"
HIST_WIDTH = 10

_LTOKS = duck_tokens("lower(text)")
_TOKS = duck_tokens("text")


def _repetition_oracle() -> str:
    b2 = duck_word_shingles("lower(text)", 2)
    b3 = duck_word_shingles("lower(text)", 3)
    return f"""
    WITH tc AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents) GROUP BY 1, 2
    ),
    td AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS mx, CAST(SUM(c) AS BIGINT) AS nt
      FROM tc GROUP BY 1
    ),
    b2c AS (
      SELECT doc_id, sh, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({b2}) AS sh FROM documents) GROUP BY 1, 2
    ),
    b2d AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS bt, CAST(COUNT(*) AS BIGINT) AS bdx
      FROM b2c GROUP BY 1
    ),
    b3c AS (
      SELECT doc_id, sh, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({b3}) AS sh FROM documents) GROUP BY 1, 2
    ),
    b3d AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tt, CAST(COUNT(*) AS BIGINT) AS tdx
      FROM b3c GROUP BY 1
    )
    SELECT td.doc_id,
           nt AS n_tokens,
           CAST(mx AS DOUBLE) / nt AS top_token_frac,
           CAST(bt - bdx AS DOUBLE) / bt AS dup_bigram_frac,
           CAST(tt - tdx AS DOUBLE) / tt AS dup_trigram_frac,
           (CAST(mx AS DOUBLE) / nt > {REP_TOP_MAX}
            OR CAST(bt - bdx AS DOUBLE) / bt > {REP_BI_MAX}
            OR CAST(tt - tdx AS DOUBLE) / tt > {REP_TRI_MAX}) AS repetitive
    FROM td JOIN b2d USING (doc_id) JOIN b3d USING (doc_id)
    """


@query("text_repetition_metrics", oracle=_repetition_oracle())
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules: most-frequent-token
    fraction, duplicate word-2/3-gram fractions, flag when any exceeds
    the published thresholds — the boilerplate/keyword-stuffing filter.
    Linear explode + two-level agg, all keyed by doc id."""
    return cu.repetition_metrics(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        top_frac_max=REP_TOP_MAX,
        dup_bigram_max=REP_BI_MAX,
        dup_trigram_max=REP_TRI_MAX,
    )


def _decontam_oracle() -> str:
    shingles = duck_word_shingles("lower(text)", DECONTAM_K)
    bench_hash = duck_hash60(f"text || '{BENCH_SALT}'")
    bench = f"{bench_hash} % 100 >= {BENCH_PCT}"
    return f"""
    WITH d AS (SELECT doc_id, text, {bench} AS is_bench FROM documents),
    shd AS (
      SELECT DISTINCT doc_id, is_bench, sh FROM
        (SELECT doc_id, is_bench, unnest({shingles}) AS sh FROM d)
    ),
    bg AS (SELECT DISTINCT sh FROM shd WHERE is_bench),
    shared AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM (SELECT * FROM shd WHERE NOT is_bench) tr JOIN bg USING (sh)
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(s.n_shared, 0) AS n_shared,
           COALESCE(s.n_shared, 0) > 0 AS contaminated
    FROM d LEFT JOIN shared s USING (doc_id)
    WHERE NOT d.is_bench
    """


@query("decontam_ngram_overlap", oracle=_decontam_oracle())
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C): mark training docs
    sharing any {DECONTAM_K}-word shingle with the held-out benchmark
    split (content-hash top {100 - BENCH_PCT}%).  Benchmark shingle set
    is broadcast (eval suites are bounded); corpus side is one linear
    scan + one doc-id agg."""
    docs = load_table(spark, sf_dir, "documents")
    is_bench = (
        hash60(F.concat(F.col("text"), F.lit(BENCH_SALT))) % 100 >= BENCH_PCT
    )
    flagged = docs.withColumn("is_bench", is_bench)
    return cu.ngram_decontam(flagged, "doc_id", "text", "is_bench", k=DECONTAM_K)


def _pack_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT lang, doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS w,
             doc_id % {PACK_BUCKETS} AS b
      FROM documents
    ),
    a AS (
      SELECT lang, b, doc_id, w,
             CAST(SUM(w) OVER (
               PARTITION BY lang, b ORDER BY w DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM d
    )
    SELECT lang,
           CAST(b * 4294967296 + CAST(FLOOR(CAST(cum - w AS DOUBLE) / {PACK_CAPACITY}) AS BIGINT) AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS shard_weight
    FROM a GROUP BY 1, 2
    """


@query("pack_token_shards", oracle=_pack_oracle())
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: contiguous greedy fill of
    {PACK_CAPACITY}-token shards per (lang, bucket), deterministic order
    (weight desc, id asc), overflow-tolerant.  {PACK_BUCKETS} buckets per
    lang keep the inherently-sequential fill parallel at scale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("w")
    )
    return cu.pack_contiguous(
        docs, "doc_id", "w", "lang", capacity=PACK_CAPACITY, n_buckets=PACK_BUCKETS
    )


def _strat_case() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(STRAT_RATES.items())
    )
    return f"CASE lang {whens} ELSE {STRAT_DEFAULT} END"


def _strat_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT lang,
             {_strat_case()} AS target_pct,
             {duck_hash60(f"text || '{STRAT_SALT}'")} % 100 AS bkt
      FROM documents
    )
    SELECT lang,
           CAST(MIN(target_pct) AS BIGINT) AS target_pct,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE bkt < target_pct) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE bkt < target_pct) AS DOUBLE) / COUNT(*) AS achieved_frac
    FROM d GROUP BY 1
    """


@query("stratified_sample_stats", oracle=_strat_oracle())
def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling audit: content-hash keep
    rule at per-stratum rates (rebalancing an en-heavy corpus), reporting
    target vs achieved rates.  Membership is a pure projection — the only
    shuffle is the final stats agg."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(STRAT_DEFAULT)
    for stratum, r in sorted(STRAT_RATES.items()):
        rate = F.when(F.col("lang") == stratum, r).otherwise(rate)
    kept = cu.stratified_sample(
        docs, "lang", STRAT_RATES, STRAT_DEFAULT, F.col("text"), STRAT_SALT
    )
    kept_stats = kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_kept")
    ).withColumnRenamed("lang", "_klang")
    totals = docs.groupBy("lang").agg(
        F.min(rate).cast("long").alias("target_pct"),
        F.count("*").cast("long").alias("n_total"),
    )
    # null-safe join key: groupBy keeps a NULL-lang stratum in BOTH
    # aggregates, but a plain equality join would never match it — the
    # NULL stratum's kept count would silently read 0 while the
    # single-scan oracle counts it.
    return totals.join(
        kept_stats, F.col("lang").eqNullSafe(F.col("_klang")), "left"
    ).select(
        "lang",
        "target_pct",
        "n_total",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        (
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("double") / F.col("n_total")
        ).alias("achieved_frac"),
    )


def _rollup_oracle() -> str:
    from mapreduceproject_spark.operators import text_analysis as ta

    stoplist = ", ".join(f"'{s}'" for s in ta.STOPWORDS)
    return rf"""
    WITH q AS (
      SELECT source, lang,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             1.0 - CAST(len(regexp_extract_all(text, '{ta.PUNCT_PATTERN}')) AS DOUBLE) / NULLIF(length(text), 0) * 2.0
                 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / NULLIF(length(text), 0)
                 + CAST(len(list_filter({_TOKS}, t -> list_contains([{stoplist}], lower(t)))) AS DOUBLE)
                   / NULLIF(len({_TOKS}), 0) * 0.5 AS quality
      FROM documents
    ),
    base AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(FLOOR(quality * 1000000.0) AS BIGINT)) AS BIGINT) AS q_micro,
             CAST(COUNT(*) FILTER (WHERE n_tokens >= 5 AND quality > 0.5) AS BIGINT) AS n_keep
      FROM q GROUP BY 1
    ),
    lg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM (SELECT DISTINCT source, lang FROM documents) GROUP BY 1
    )
    SELECT base.source, n_docs, n_langs,
           CAST(q_micro AS DOUBLE) / 1000000.0 / n_docs AS mean_quality,
           CAST(n_keep AS DOUBLE) / n_docs AS keep_frac
    FROM base JOIN lg ON lg.source = base.source
    """


@query("source_quality_rollup", oracle=_rollup_oracle())
def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: doc count, language spread, mean
    composite quality, keep-rate.  Mean is exact (per-row micro-unit
    quantization, integer sum) — float accumulation order can never
    shift the result.  Distinct-lang count is a dedup-then-count (no
    Expand), mirroring the approx-distinct query's shape."""
    from mapreduceproject_spark.operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    toks = tokens(t)
    punct = F.size(F.regexp_extract_all(t, F.lit(ta.PUNCT_PATTERN), F.lit(0)))
    digits = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), F.lit(0)))
    stop_arr = F.array(*[F.lit(s) for s in ta.STOPWORDS])
    stops = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    # nullif denominators: empty / whitespace-only docs yield NULL quality
    # on both engines (ANSI would otherwise raise DIVIDE_BY_ZERO here and
    # DuckDB's NaN would error the micro-quantizing BIGINT cast); NULL
    # rows drop out of q_micro identically on both sides and fail the
    # keep predicate deterministically.
    quality = (
        F.lit(1.0)
        - punct.cast("double") / F.nullif(F.length(t), F.lit(0)) * 2.0
        - digits.cast("double") / F.nullif(F.length(t), F.lit(0))
        + stops.cast("double") / F.nullif(F.size(toks), F.lit(0)) * 0.5
    )
    per = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        quality.alias("quality"),
    )
    base = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.floor(F.col("quality") * 1000000.0).cast("long"))
        .cast("long")
        .alias("q_micro"),
        F.sum(
            F.when((F.col("n_tokens") >= 5) & (F.col("quality") > 0.5), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_keep"),
    )
    langs = (
        docs.select("source", "lang")
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_langs"))
    )
    return base.join(langs, "source").select(
        "source",
        "n_docs",
        "n_langs",
        (F.col("q_micro").cast("double") / 1000000.0 / F.col("n_docs")).alias(
            "mean_quality"
        ),
        (F.col("n_keep").cast("double") / F.col("n_docs")).alias("keep_frac"),
    )


@query(
    "token_length_histogram",
    oracle=f"""
    SELECT lang,
           CAST(FLOOR(CAST(len({_TOKS}) AS DOUBLE) / {HIST_WIDTH}) * {HIST_WIDTH} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1, 2
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram per language (width-{HIST_WIDTH} buckets) —
    the length-distribution profile that sizes packing capacity and
    truncation limits.  Pure projection + one agg."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text")))
    return docs.groupBy(
        "lang",
        (F.floor(n / F.lit(HIST_WIDTH)) * HIST_WIDTH).cast("long").alias("bucket"),
    ).agg(F.count("*").cast("long").alias("n_docs"))


# -- round-2 additions: span dedup, LM quality proxy, funnel report ----------
SPAN_K = 20
FUNNEL_MIN_TOKS, FUNNEL_MAX_TOKS = 30, 5000
FUNNEL_TOP_PCT = 12  # top-token ratio ≤ 12% (compared multiplicatively)


def _span_dedup_oracle() -> str:
    h = duck_hash60("span")
    return f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    spans AS (
      SELECT doc_id,
             unnest(list_transform(range(0, (len(t) + {SPAN_K - 1}) // {SPAN_K}),
                    j -> array_to_string(t[j*{SPAN_K}+1 : j*{SPAN_K}+{SPAN_K}], ' '))) AS span
      FROM tk
    ),
    hashed AS (SELECT doc_id, {h} AS h FROM spans),
    counted AS (
      SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS global_c
      FROM hashed
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN global_c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           CAST(SUM(CASE WHEN global_c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
    FROM counted GROUP BY doc_id
    """


@query("dedup_span_exact", oracle=_span_dedup_oracle())
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup profile — the line/paragraph-dedup analogue
    (CCNet / RefinedWeb run it on lines; these fixtures have no newlines,
    so the unit is a fixed {SPAN_K}-token span).  Each document is cut
    into non-overlapping spans; a span occurring ≥2 times corpus-wide is
    duplicated text.  Per-document output: span count, duplicated-span
    count, duplication ratio — the signal used to drop boilerplate-heavy
    documents.

    Plan: tokens posexplode once (linear — no transform-over-slice, see
    SCALING.md), spans assembled by ordered per-(doc, span) agg, then ONE
    window count over the 60-bit span hash (shuffle key is a long, never
    the span text).  At 100 TB the span-hash exchange is the only
    corpus-wide shuffle, and it carries (doc_id, h) pairs only."""
    docs = load_table(spark, sf_dir, "documents")
    tok_rows = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("i", "t")
    )
    spans = (
        tok_rows.groupBy("doc_id", F.floor(F.col("i") / SPAN_K).alias("span_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "t"))), lambda x: x["t"]
                ),
                " ",
            ).alias("span")
        )
        .select("doc_id", hash60(F.col("span")).alias("h"))
    )
    from pyspark.sql import Window

    global_c = F.count("*").over(Window.partitionBy("h"))
    counted = spans.select("doc_id", global_c.alias("global_c"))
    dup = F.sum(F.when(F.col("global_c") >= 2, 1).otherwise(0)).cast("long")
    return counted.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        dup.alias("n_dup_spans"),
        (dup.cast("double") / F.count("*")).alias("dup_ratio"),
    )


def _unigram_logprob_oracle() -> str:
    return f"""
    WITH dt AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c_dt
      FROM (SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents) GROUP BY 1, 2
    ),
    vocab AS (SELECT tok, CAST(SUM(c_dt) AS BIGINT) AS c_t FROM dt GROUP BY tok),
    tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS big_t FROM vocab),
    scored AS (
      SELECT dt.doc_id,
             dt.c_dt,
             dt.c_dt * CAST(FLOOR(LN(CAST(big_t AS DOUBLE) / c_t) * 1000000.0) AS BIGINT) AS q
      FROM dt JOIN vocab USING (tok), tot
    )
    SELECT doc_id,
           CAST(SUM(c_dt) AS BIGINT) AS n_tokens,
           CAST(SUM(q) AS DOUBLE) / 1000000.0 / SUM(c_dt) AS avg_nll
    FROM scored GROUP BY doc_id
    """


@query("text_unigram_logprob", oracle=_unigram_logprob_oracle())
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document — the perplexity-proxy
    quality filter (CCNet ranks documents by LM perplexity; the unigram
    model is its distributable first rung).  avg_nll = mean over tokens of
    −ln p(token) under the corpus unigram distribution; unusually low =
    boilerplate/repetition, unusually high = noise/lang mismatch.

    Determinism: per-token surprisal is micro-quantized (floor·1e6) to a
    long BEFORE summation — float sums would be partial-agg-order-
    dependent; integer sums bit-match any execution order and engine.

    Scale: doc-term counts (one shuffle), vocab rollup (second, vocab-
    sized), then a vocab join deliberately NOT broadcast-hinted — a
    web-corpus vocabulary is tens of GB, so AQE picks broadcast only when
    it truly fits (same contract as text_tfidf_top_terms).  The 1-row
    corpus total does broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c_dt"))
    )
    vocab = dt.groupBy("tok").agg(F.sum("c_dt").cast("long").alias("c_t"))
    tot = vocab.agg(F.sum("c_t").cast("long").alias("big_t"))
    q = F.col("c_dt") * F.floor(
        F.log(F.col("big_t").cast("double") / F.col("c_t")) * 1000000.0
    ).cast("long")
    scored = dt.join(vocab, "tok").crossJoin(F.broadcast(tot)).select(
        "doc_id", "c_dt", q.alias("q")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c_dt").cast("long").alias("n_tokens"),
        (F.sum("q").cast("double") / 1000000.0 / F.sum("c_dt")).alias("avg_nll"),
    )


def _funnel_oracle() -> str:
    h = duck_hash60("text")
    return f"""
    WITH per AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS nt,
             {h} AS h
      FROM documents
    ),
    topr AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS mx FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents) GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    flags AS (
      SELECT per.doc_id,
             nt BETWEEN {FUNNEL_MIN_TOKS} AND {FUNNEL_MAX_TOKS} AS f_len,
             mx * 100 <= nt * {FUNNEL_TOP_PCT} AS f_rep,
             per.doc_id = MIN(per.doc_id) OVER (PARTITION BY h) AS f_uniq
      FROM per JOIN topr ON topr.doc_id = per.doc_id
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN f_len AND f_rep THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN f_len AND f_rep AND f_uniq THEN 1 ELSE 0 END) AS BIGINT) AS s3
      FROM flags
    )
    SELECT stage, n_docs FROM (
      SELECT 0 AS stage_ord, 'total' AS stage, s0 AS n_docs FROM agg
      UNION ALL SELECT 1, 'length', s1 FROM agg
      UNION ALL SELECT 2, 'repetition', s2 FROM agg
      UNION ALL SELECT 3, 'exact_dedup', s3 FROM agg)
    """


@query("curation_funnel_report", oracle=_funnel_oracle())
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel observability: how many documents survive each
    cumulative filter stage — total → length window → repetition cap →
    exact-dedup keep-first.  The per-stage survivor counts are the
    dashboard every production curation pipeline publishes per batch.

    Flags are computed in one pass (token count and top-token count share
    the doc-term agg; the dedup flag is a min-over-hash window), compared
    multiplicatively (mx·100 ≤ nt·{FUNNEL_TOP_PCT}) so no ratio rounding,
    then collapsed to a 4-row stack — output size is O(stages), never
    O(corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    topr = dt.groupBy("doc_id").agg(
        F.max("c").cast("long").alias("mx"), F.sum("c").cast("long").alias("nt")
    )
    from pyspark.sql import Window

    per = docs.select("doc_id", hash60(F.col("text")).alias("h"))
    f_uniq = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("h"))
    flags = (
        per.select("doc_id", f_uniq.alias("f_uniq"))
        .join(topr, "doc_id")
        .select(
            F.col("nt").between(FUNNEL_MIN_TOKS, FUNNEL_MAX_TOKS).alias("f_len"),
            (F.col("mx") * 100 <= F.col("nt") * FUNNEL_TOP_PCT).alias("f_rep"),
            "f_uniq",
        )
    )
    agg = flags.agg(
        F.count("*").cast("long").alias("s0"),
        F.sum(F.when(F.col("f_len"), 1).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(F.col("f_len") & F.col("f_rep"), 1).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(F.col("f_len") & F.col("f_rep") & F.col("f_uniq"), 1).otherwise(0)
        )
        .cast("long")
        .alias("s3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'total', s0, 'length', s1, 'repetition', s2, 'exact_dedup', s3)"
        ).alias("stage", "n_docs")
    )


MIX_ALPHA_NUM, MIX_ALPHA_DEN = 1, 2  # alpha = 0.5 -> sqrt temperature


@query(
    "source_mix_weights",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    pw AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS p FROM tok),
    tot AS (SELECT SUM(p) AS z, SUM(n_tokens) AS t FROM pw)
    SELECT source, n_tokens,
           CAST(p / z AS DOUBLE) AS mix_weight,
           CAST((p / z) * t / n_tokens AS DOUBLE) AS effective_epochs
    FROM pw, tot
    """,
)
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix temperature sampling: per-source weights ∝ tokens^α
    with α = {MIX_ALPHA_NUM}/{MIX_ALPHA_DEN} (the UnifiedQA / Pile-style
    smoothing that up-samples small sources), plus the implied effective
    epochs (>1 means the source repeats under the mix).

    α = 1/2 makes the power an exact IEEE sqrt — identical on every
    engine, unlike a general pow.  Scale: one agg to source cardinality,
    then a 1-row broadcast normalizer; corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    pw = tok.withColumn("p", F.sqrt(F.col("n_tokens").cast("double")))
    tot = pw.agg(F.sum("p").alias("z"), F.sum("n_tokens").alias("t"))
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            (F.col("p") / F.col("z")).cast("double").alias("mix_weight"),
            ((F.col("p") / F.col("z")) * F.col("t") / F.col("n_tokens"))
            .cast("double")
            .alias("effective_epochs"),
        )
    )


# -- weighted training-order interleave --------------------------------------
INTERLEAVE_N = 1000


@query(
    "training_interleave",
    oracle=f"""
    WITH cnt AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    zt AS (SELECT SUM(sqrt(CAST(n AS DOUBLE))) AS z FROM cnt),
    pos AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS DOUBLE) AS p
      FROM documents
    ),
    vt AS (
      SELECT doc_id, pos.source, p * z / sqrt(CAST(n AS DOUBLE)) AS v
      FROM pos JOIN cnt USING (source) CROSS JOIN zt
    )
    SELECT CAST(row_number() OVER (ORDER BY v, source, doc_id) AS BIGINT) AS global_pos,
           doc_id, source
    FROM (SELECT * FROM vt ORDER BY v, source, doc_id LIMIT {INTERLEAVE_N})
    """,
)
def training_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleaving of sources into a global
    training order (first {INTERLEAVE_N} positions): each source advances
    at a rate ∝ √(its size) — the same α=1/2 temperature as
    `source_mix_weights` — via virtual time v = pos·Z/√n_source, the
    classic weighted-fair-queueing schedule.  Small sources surface early
    and repeat-interleave instead of clumping at the tail.

    Scale: per-source positions are a partitioned window; the global
    cut is orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    never a full sort); only the {INTERLEAVE_N}-row result passes through
    the final single-partition position numbering.  √ and ·/÷ are
    exact-rounded IEEE, so ordering is engine-identical."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    zt = F.broadcast(cnt.agg(F.sum(F.sqrt(F.col("n").cast("double"))).alias("z")))
    wp = Window.partitionBy("source").orderBy("doc_id")
    pos = docs.select(
        "doc_id", "source", F.row_number().over(wp).cast("double").alias("p")
    )
    vt = (
        pos.join(cnt, "source")
        .crossJoin(zt)
        .select(
            "doc_id",
            "source",
            (F.col("p") * F.col("z") / F.sqrt(F.col("n").cast("double"))).alias("v"),
        )
    )
    top = vt.orderBy("v", "source", "doc_id").limit(INTERLEAVE_N)
    wg = Window.orderBy("v", "source", "doc_id")
    return top.select(
        F.row_number().over(wg).cast("long").alias("global_pos"),
        "doc_id",
        "source",
    )


# -- exact heavy hitters (MG candidates + exact verify) ---------------------
HH_PHI = 0.02


@query(
    "heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT unnest({_LTOKS}) AS term FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(*) AS DOUBLE) / total AS freq
    FROM t, n GROUP BY term, total
    HAVING COUNT(*) >= {HH_PHI} * total
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vocabulary heavy hitters (frequency >= {HH_PHI}): bounded-
    memory Misra-Gries candidate pass per partition, then broadcast-
    filtered exact verification — the full-vocabulary shuffle never
    happens, but the output is exact (operators/frequency.py), which is
    why the oracle is a plain GROUP BY ... HAVING."""
    from mapreduceproject_spark.operators.frequency import heavy_hitters_exact
    from mapreduceproject_spark.sources.catalog import spread_for_compute

    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    return heavy_hitters_exact(toks, "term", phi=HH_PHI)


# -- weighted sampling without replacement (round 4) -------------------------
WSAMPLE_N, WSAMPLE_SALT = 50, "|wsample-v1"
_TWO60 = float(1 << 60)


@query(
    "weighted_sample_wor",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, lang, source, n_chars,
             ln(({duck_hash60(f"text || '{WSAMPLE_SALT}'")} + 1) / {_TWO60!r}) / n_chars AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS weight, es_key
    FROM k ORDER BY es_key DESC, doc_id LIMIT {WSAMPLE_N}
    """,
)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement in one distributed pass —
    Efraimidis-Spirakis exponential-sort keys (key = ln(u)/w, take the
    top {WSAMPLE_N}): each document's inclusion probability is
    proportional to its weight (n_chars here — the 'sample long docs
    more' curation policy), with NO sequential state, NO rejection
    loop, and NO driver-side draw — the only global operation is a
    TakeOrdered top-k carrying two longs + a double per row.  u is
    hash-derived, so the sample is reproducible across runs and both
    engines draw identical keys.  This is the distributed replacement
    for `ORDER BY random() LIMIT n` (nondeterministic, full sort) and
    for sequential reservoir algorithms (stateful, unmergeable)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (hash60(F.concat(F.col("text"), F.lit(WSAMPLE_SALT))) + 1) / F.lit(_TWO60)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(WSAMPLE_N)
    )


# -- budget-constrained top-p selection (round 4) ---------------------------
# Per source, take the highest-quality documents until TOPP_BUDGET_BP
# basis points of that source's token mass is selected (the crossing
# document is included) — the nucleus-sampling analogue of a token-budget
# data mix: "the best 60% of tokens from every source".
TOPP_BUDGET_BP = 6000


def _topp_oracle() -> str:
    from mapreduceproject_spark.operators.text_analysis import (
        QUALITY_COMPOSITE_SQL,
        duck_quality_ratio_cols,
    )

    return f"""
    WITH m AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             {duck_quality_ratio_cols(_TOKS)}
      FROM documents
    ),
    s AS (
      SELECT doc_id, source, n_tokens, {QUALITY_COMPOSITE_SQL} AS quality FROM m
    ),
    c AS (
      SELECT *,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY quality DESC NULLS LAST, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS total_tokens
      FROM s
    )
    SELECT source, doc_id, quality, n_tokens, cum_tokens, total_tokens
    FROM c
    WHERE (cum_tokens - n_tokens) * 10000 < {TOPP_BUDGET_BP} * total_tokens
    """


@query("budget_top_p_selection", oracle=_topp_oracle())
def budget_top_p_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted quality selection: per source, walk documents from
    highest to lowest quality and keep them until {TOPP_BUDGET_BP} bp of
    the source's token mass is covered (crossing document included) —
    "the best 60% of tokens from every source", the budgeted counterpart
    of stratified_sample_stats' rate-based mix.

    The inclusion test is pure integer arithmetic
    ((cum − n)·10⁴ < bp·total — no float budget thresholds), and the
    ordering key is the oracle-proven quality double with a doc_id
    tie-break, so selection is bit-deterministic.  Scale: two windows
    per source partition (running + total token sums) — sources
    parallelize; a pathologically dominant source falls back to the
    two-pass prefix-sum (per-partition subtotal broadcast) the packing
    operator documents."""
    from mapreduceproject_spark.operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    q = ta.quality_scores(docs, "doc_id", "text", keep=("source",))
    wr = (
        Window.partitionBy("source")
        .orderBy(F.desc_nulls_last("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    c = q.withColumn("cum_tokens", F.sum("n_tokens").over(wr).cast("long")).withColumn(
        "total_tokens", F.sum("n_tokens").over(wt).cast("long")
    )
    return c.filter(
        (F.col("cum_tokens") - F.col("n_tokens")) * 10000
        < F.lit(TOPP_BUDGET_BP) * F.col("total_tokens")
    ).select("source", "doc_id", "quality", "n_tokens", "cum_tokens", "total_tokens")


# -- PSI distribution drift between split halves (round 5) -------------------
# Population Stability Index — the production data-quality gate for "did
# this feature's distribution move between two populations" (snapshots,
# splits, pipeline versions).  Binning is pure integer arithmetic
# (n_chars >> 7, capped at 15) so bucket assignment is engine-identical;
# proportions use Laplace +1 smoothing per bin (denominator + PSI_BINS)
# so empty bins never divide by zero.  Exactness discipline (the
# source_token_entropy / mahalanobis pattern): each bin's term is an
# integer product (A - C) * (ln_micro(A) - ln_micro(B)) where
# A = (ca+1)(nb+16) and C = (cb+1)(na+16) are exact integer cross
# products — accumulated in decimal(38,0)/HUGEINT, divided ONCE by
# D = (na+16)(nb+16) * 1e6 as a final double expression, so both engines
# emit identical bits.  Scale: one corpus groupBy; everything after is a
# (sources x 16)-row grid of broadcast-joined bounded tables.
PSI_BINS, PSI_BIN_SHIFT, PSI_SALT, PSI_LN_SCALE = 16, 7, "|psi", 1_000_000


def _psi_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT source,
             least(n_chars // {1 << PSI_BIN_SHIFT}, {PSI_BINS - 1}) AS bin,
             {duck_hash60(f"text || '{PSI_SALT}'")} % 2 AS half
      FROM documents
    ),
    cnt AS (
      SELECT source, bin, half, CAST(COUNT(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT source, half, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.source, b.bin,
             COALESCE(a.c, 0) AS ca, COALESCE(bb.c, 0) AS cb,
             ta.n AS na, tb.n AS nb
      FROM (SELECT DISTINCT source FROM d) s
      CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) b
      LEFT JOIN cnt a  ON a.source = s.source AND a.bin = b.bin AND a.half = 0
      LEFT JOIN cnt bb ON bb.source = s.source AND bb.bin = b.bin AND bb.half = 1
      JOIN tot ta ON ta.source = s.source AND ta.half = 0
      JOIN tot tb ON tb.source = s.source AND tb.half = 1
    ),
    prods AS (
      -- factors widened BEFORE the multiply (mirrors the Spark side's
      -- decimal(19,0) factor casts): a BIGINT product would overflow at
      -- ~3.1e9 docs per half
      SELECT source, na, nb,
             CAST(ca + 1 AS HUGEINT) * CAST(nb + {PSI_BINS} AS HUGEINT) AS pa,
             CAST(cb + 1 AS HUGEINT) * CAST(na + {PSI_BINS} AS HUGEINT) AS pb
      FROM grid
    ),
    terms AS (
      SELECT source, na, nb,
             (pa - pb)
             * CAST(CAST(floor(ln(CAST(pa AS DOUBLE)) * {PSI_LN_SCALE})
                         AS BIGINT)
                    - CAST(floor(ln(CAST(pb AS DOUBLE)) * {PSI_LN_SCALE})
                           AS BIGINT) AS HUGEINT) AS t
      FROM prods
    )
    SELECT source,
           MAX(na) AS n_half_a,
           MAX(nb) AS n_half_b,
           CAST(SUM(t) AS DOUBLE)
             / (CAST(MAX(na) + {PSI_BINS} AS DOUBLE)
                * CAST(MAX(nb) + {PSI_BINS} AS DOUBLE))
             / {PSI_LN_SCALE} AS psi,
           CAST(SUM(t) AS DOUBLE)
             / (CAST(MAX(na) + {PSI_BINS} AS DOUBLE)
                * CAST(MAX(nb) + {PSI_BINS} AS DOUBLE))
             / {PSI_LN_SCALE} >= 0.2 AS drift_flag
    FROM terms GROUP BY source
    """


@query("psi_distribution_drift", oracle=_psi_oracle())
def psi_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the document-length distribution
    between the two deterministic hash halves of each source — the
    monitoring gate for "did this population's distribution move"
    between snapshots/splits/pipeline versions (psi < 0.1 stable,
    >= 0.2 actionable drift; the flag uses the classic 0.2 cut).
    Between random halves of one corpus PSI ≈ 0 — the query IS the
    null-calibration run; pointing the two halves at different
    snapshots is the production deployment.

    Exactness and scale shape per the module comment: integer bin
    assignment, Laplace-smoothed exact cross products, decimal-
    accumulated micro-quantized ln terms, one corpus groupBy then
    bounded-table joins only."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.least(
            (F.col("n_chars").cast("long") / (1 << PSI_BIN_SHIFT)).cast("long"),
            F.lit(PSI_BINS - 1).cast("long"),
        ).alias("bin"),
        (hash60(F.concat(F.col("text"), F.lit(PSI_SALT))) % 2).alias("half"),
    )
    cnt = d.groupBy("source", "bin", "half").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = cnt.groupBy("source", "half").agg(F.sum("c").cast("long").alias("n"))
    sources = d.select("source").distinct()
    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    grid = (
        sources.crossJoin(F.broadcast(bins))
        .join(
            F.broadcast(
                cnt.filter(F.col("half") == 0).select(
                    "source", "bin", F.col("c").alias("ca")
                )
            ),
            ["source", "bin"],
            "left",
        )
        .join(
            F.broadcast(
                cnt.filter(F.col("half") == 1).select(
                    "source", "bin", F.col("c").alias("cb")
                )
            ),
            ["source", "bin"],
            "left",
        )
        .join(
            F.broadcast(
                tot.filter(F.col("half") == 0).select(
                    "source", F.col("n").alias("na")
                )
            ),
            "source",
        )
        .join(
            F.broadcast(
                tot.filter(F.col("half") == 1).select(
                    "source", F.col("n").alias("nb")
                )
            ),
            "source",
        )
        .fillna(0, subset=["ca", "cb"])
    )
    # factors cast to decimal BEFORE the multiply: ca,nb are per-half doc
    # counts, so the int64 product (ca+1)*(nb+16) would wrap silently at
    # ~3.1e9 docs per half — inside the design scale.  decimal(19,0) ×
    # decimal(19,0) → decimal(38,0): exact up to 38 digits.
    a = (F.col("ca") + 1).cast("decimal(19,0)") * (
        F.col("nb") + PSI_BINS
    ).cast("decimal(19,0)")
    b = (F.col("cb") + 1).cast("decimal(19,0)") * (
        F.col("na") + PSI_BINS
    ).cast("decimal(19,0)")
    term = (
        (a - b)
        * (
            F.floor(F.log(a.cast("double")) * PSI_LN_SCALE)
            - F.floor(F.log(b.cast("double")) * PSI_LN_SCALE)
        ).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    agg = grid.groupBy("source").agg(
        F.max("na").alias("n_half_a"),
        F.max("nb").alias("n_half_b"),
        F.sum(term).alias("_t"),
    )
    psi = (
        F.col("_t").cast("double")
        / (
            (F.col("n_half_a") + PSI_BINS).cast("double")
            * (F.col("n_half_b") + PSI_BINS).cast("double")
        )
        / PSI_LN_SCALE
    )
    return agg.select(
        "source",
        "n_half_a",
        "n_half_b",
        psi.alias("psi"),
        (psi >= 0.2).alias("drift_flag"),
    )


# -- fixed-size per-stratum sample (round 5) ---------------------------------
# stratified_sample_stats draws at a RATE per stratum; eval-set builds
# want a fixed COUNT per stratum regardless of stratum size.  The draw
# is the k lowest content-hash ranks per source — deterministic,
# engine-portable, one partitioned window (never a global sort), and at
# 100 TB the per-source top-k runs as a partial TakeOrdered per
# partition before the single per-source merge.
STRAT_K, STRAT_K_SALT = 50, "|fixk"


@query(
    "stratified_fixed_k_sample",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {duck_hash60(f"text || '{STRAT_K_SALT}'")}, doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {STRAT_K}
    """,
)
def stratified_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {STRAT_K} documents per source, drawn by lowest salted
    content-hash rank (doc_id tie-break) — the fixed-size per-stratum
    eval/inspection sample, reproducible across runs and engines
    (stratified_sample_stats' rate-based twin)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hash60(F.concat(F.col("text"), F.lit(STRAT_K_SALT))), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= STRAT_K)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )
