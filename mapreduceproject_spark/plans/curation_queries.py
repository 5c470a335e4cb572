"""Corpus-curation suite over the documents table: the training-data
pipeline stages between raw text and shard writing — repetition filters,
benchmark decontamination, token-budget packing, stratified sampling,
per-source rollups.  Every oracle replicates the operator's exact
algorithm (same tokenizer, same hash60, same integer arithmetic) for
bit-exact parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import DataFrame, SparkSession

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
    kept_stats = kept.groupBy("lang").agg(F.count("*").cast("long").alias("n_kept"))
    totals = docs.groupBy("lang").agg(
        F.min(rate).cast("long").alias("target_pct"),
        F.count("*").cast("long").alias("n_total"),
    )
    return totals.join(kept_stats, "lang", "left").select(
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
             1.0 - CAST(len(regexp_extract_all(text, '{ta.PUNCT_PATTERN}')) AS DOUBLE) / length(text) * 2.0
                 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
                 + CAST(len(list_filter({_TOKS}, t -> list_contains([{stoplist}], lower(t)))) AS DOUBLE)
                   / len({_TOKS}) * 0.5 AS quality
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
    quality = (
        F.lit(1.0)
        - punct.cast("double") / F.length(t) * 2.0
        - digits.cast("double") / F.length(t)
        + stops.cast("double") / F.size(toks) * 0.5
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
