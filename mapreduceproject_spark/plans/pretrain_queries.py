"""Pretraining-corpus curation queries: published quality heuristics
(Gopher/C4 rule report), DSIR importance reweighting, and shingle-novelty
scoring — the selection tier that runs between dedup and packing.

Oracles replicate the exact integer-arithmetic decisions (rule thresholds
compared in cross-multiplied integer form, DSIR λ micro-quantized, novelty
in basis points) so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.hashing import duck_hash60
from mapreduceproject_spark.functions.textfn import (
    duck_token_rows,
    duck_tokens,
    duck_word_shingles,
)
from mapreduceproject_spark.operators import quality as q
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

# stopword list shared with the quality-score queries (text_analysis.py)
from mapreduceproject_spark.operators.text_analysis import STOPWORDS

DSIR_TOP_N = 50
NOVELTY_K = 3


def _gopher_oracle() -> str:
    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = duck_tokens("text")
    return f"""
    WITH m AS (
      SELECT source,
             len(toks) AS n_words,
             COALESCE(CAST(list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT), 0) AS sum_len,
             len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...'))) AS n_symbol,
             len(list_filter([{stoplist}],
                 s -> list_contains(list_transform(toks, t -> lower(t)), s))) AS stop_hits
      FROM (SELECT source, {toks} AS toks FROM documents)
    ),
    f AS (
      SELECT source,
             (n_words < {q.GOPHER_MIN_WORDS} OR n_words > {q.GOPHER_MAX_WORDS}) AS fw,
             (sum_len < {q.GOPHER_MIN_MEAN_WORD_LEN} * n_words
              OR sum_len > {q.GOPHER_MAX_MEAN_WORD_LEN} * n_words) AS fm,
             (n_symbol * 100 > {q.GOPHER_MAX_SYMBOL_RATIO_PCT} * n_words) AS fs,
             (stop_hits < {q.GOPHER_MIN_STOPWORD_HITS}) AS fst
      FROM m
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(fw AS BIGINT)) AS BIGINT) AS fail_word_count,
           CAST(SUM(CAST(fm AS BIGINT)) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(CAST(fs AS BIGINT)) AS BIGINT) AS fail_symbol_ratio,
           CAST(SUM(CAST(fst AS BIGINT)) AS BIGINT) AS fail_stopwords,
           CAST(SUM(CAST((NOT fw AND NOT fm AND NOT fs AND NOT fst) AS BIGINT)) AS BIGINT) AS n_kept
    FROM f GROUP BY source
    """


@query("gopher_quality_filter", oracle=_gopher_oracle())
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher/C4 rule-firing report (word-count bounds,
    mean-word-length bounds, symbol ratio, stopword presence) — the audit
    a curation run publishes before dropping anything.  One linear pass +
    a per-source aggregate; every threshold compares in integer form
    (operators/quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return q.gopher_rule_report(docs, "doc_id", "text", "source", STOPWORDS)


def _dsir_oracle() -> str:
    b = q.DSIR_BUCKETS
    return f"""
    WITH feats AS (
      SELECT doc_id AS id, tok AS feature
      FROM {duck_token_rows("text", "doc_id")}
      UNION ALL
      SELECT doc_id AS id, unnest({duck_word_shingles("text", 2)}) AS feature
      FROM documents
    ),
    tflag AS (SELECT doc_id AS id, (lang = 'en') AS is_t FROM documents),
    bk AS (
      SELECT f.id, t.is_t, ({duck_hash60("feature")}) % {b} AS bucket
      FROM feats f JOIN tflag t ON t.id = f.id
    ),
    bc AS (
      SELECT bucket, SUM(CAST(is_t AS BIGINT)) AS t_b, COUNT(*) AS r_b
      FROM bk GROUP BY bucket
    ),
    tot AS (SELECT SUM(t_b) AS tt, SUM(r_b) AS rt FROM bc),
    lam AS (
      SELECT bucket,
             CAST(floor(1000000 * (ln((t_b + 1) / (tt + {b})) - ln((r_b + 1) / (rt + {b})))) AS BIGINT) AS lam_micro
      FROM bc, tot
    ),
    db AS (SELECT id, bucket, COUNT(*) AS cnt FROM bk GROUP BY id, bucket),
    w AS (
      SELECT id AS doc_id, CAST(SUM(cnt * lam_micro) AS BIGINT) AS weight_micro
      FROM db JOIN lam USING (bucket) GROUP BY id
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, lang, weight_micro
    FROM (
      SELECT w.doc_id, d.lang, w.weight_micro,
             row_number() OVER (ORDER BY w.weight_micro DESC, w.doc_id) AS rnk
      FROM w JOIN documents d USING (doc_id))
    WHERE rnk <= {DSIR_TOP_N}
    """


@query("dsir_importance_weights", oracle=_dsir_oracle())
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance reweighting toward the lang='en'
    slice over hashed unigram+bigram buckets: top-{DSIR_TOP_N} documents
    by integer micro-weight.  The λ table is ≤{q.DSIR_BUCKETS} rows and
    broadcasts; the corpus is touched twice, linearly
    (operators/quality.py::dsir_weights)."""
    docs = load_table(spark, sf_dir, "documents")
    w = q.dsir_weights(docs, "doc_id", "text", F.col("lang") == "en")
    # top-N via TakeOrdered (total order through the doc_id tie-break),
    # NOT a global row_number window — the unpartitioned window funnels
    # the whole corpus through one task before the rank filter; the
    # limit keeps the cut distributed and the residual rank window runs
    # over {DSIR_TOP_N} surviving rows only.
    win = Window.orderBy(F.desc("weight_micro"), F.asc("doc_id"))
    return (
        w.join(docs.select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("weight_micro"), F.asc("doc_id"))
        .limit(DSIR_TOP_N)
        .withColumn("rnk", F.row_number().over(win).cast("long"))
        .select("rnk", "doc_id", "lang", "weight_micro")
    )


def _novelty_oracle() -> str:
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, sh
      FROM (SELECT doc_id, unnest({duck_word_shingles("text", NOVELTY_K)}) AS sh
            FROM documents)
    ),
    dfc AS (SELECT sh, COUNT(*) AS df_sh FROM sh GROUP BY sh)
    SELECT id AS doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CAST(df_sh = 1 AS BIGINT)) AS BIGINT) AS n_unique,
           CAST(floor(10000 * SUM(CAST(df_sh = 1 AS BIGINT)) / COUNT(*)) AS BIGINT) AS novelty_bp
    FROM sh JOIN dfc USING (sh) GROUP BY id
    """


@query("doc_shingle_novelty", oracle=_novelty_oracle())
def doc_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty score: the fraction (in basis points) of its
    distinct {NOVELTY_K}-word shingles appearing in no other document —
    the inverse of the dedup tier's duplication signal, used for
    diversity-weighted sampling.  Two hash shuffles (shingle df, doc
    rollup), both corpus-linear."""
    docs = load_table(spark, sf_dir, "documents")
    return q.shingle_novelty(docs, "doc_id", "text", k=NOVELTY_K)


# -- embedding-space outlier gate (round 4) ----------------------------------


def _outlier_oracle() -> str:
    from mapreduceproject_spark.functions.vectors import duck_quantize

    sq = "(CAST(q[i] AS DOUBLE) - mu_arr[i])"
    return f"""
    WITH e AS (SELECT vec_id, label, {duck_quantize("embedding")} AS q
               FROM embeddings),
    d AS (
      SELECT CAST(i AS BIGINT) - 1 AS dim, q[i] AS v
      FROM (SELECT q, unnest(range(1, len(q) + 1)) AS i FROM e)
    ),
    st AS (SELECT dim, CAST(SUM(v) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s2,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM d GROUP BY dim),
    mo AS (SELECT dim, s1 / n AS mu, (s2 - s1 * s1 / n) / n AS var FROM st),
    ag AS (SELECT list(mu ORDER BY dim) AS mu_arr,
                  list(var ORDER BY dim) AS var_arr FROM mo)
    SELECT vec_id, label, maha_d2,
           maha_d2 > (ndim + 3.0 * sqrt(2.0 * ndim)) AS is_outlier
    FROM (
      SELECT e.vec_id, e.label,
             list_aggregate(list_transform(range(1, len(q) + 1),
               i -> ({sq} * {sq}) / greatest(var_arr[i], 1e-12)),
               'sum') AS maha_d2,
             CAST(len(q) AS DOUBLE) AS ndim
      FROM e, ag
    )
    """


@query("embedding_outlier_scores", oracle=_outlier_oracle())
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis embedding outlier gate: per-vector distance
    to the corpus distribution with a chi-square-motivated cut — drops
    encoder failures / off-distribution vectors before the semantic
    tiers (SemDeDup, DSIR) trust them.  Exact-integer per-dim moments +
    element-order d² sum make both engines bit-identical
    (operators/similarity.py::mahalanobis_outlier_scores)."""
    from mapreduceproject_spark.operators.similarity import (
        mahalanobis_outlier_scores,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return mahalanobis_outlier_scores(emb, "vec_id", "embedding", keep=["label"])


# -- split drift gauge (round 4) ---------------------------------------------
DRIFT_SALT = "|split-v1"
DRIFT_MIN_COS = 0.99


def _drift_oracle() -> str:
    from mapreduceproject_spark.functions.hashing import duck_hash60
    from mapreduceproject_spark.functions.vectors import duck_quantize

    v = f"{duck_hash60(f'CAST(vec_id AS VARCHAR) || {DRIFT_SALT!r}')} % 2"
    return f"""
    WITH e AS (SELECT label, {v} AS v, {duck_quantize("embedding")} AS q
               FROM embeddings),
    c AS (SELECT label,
                 CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
                 CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_val
          FROM e GROUP BY label),
    d AS (SELECT label, v, CAST(i AS BIGINT) - 1 AS dim, q[i] AS qv
          FROM (SELECT label, v, q, unnest(range(1, len(q) + 1)) AS i FROM e)),
    s AS (SELECT label, dim,
                 CAST(SUM(CASE WHEN v = 0 THEN qv ELSE 0 END) AS BIGINT) AS sa,
                 CAST(SUM(CASE WHEN v = 1 THEN qv ELSE 0 END) AS BIGINT) AS sb
          FROM d GROUP BY label, dim),
    g AS (SELECT label,
                 CAST(SUM(CAST(sa AS HUGEINT) * sb) AS DOUBLE) AS dt,
                 CAST(SUM(CAST(sa AS HUGEINT) * sa) AS DOUBLE) AS n2a,
                 CAST(SUM(CAST(sb AS HUGEINT) * sb) AS DOUBLE) AS n2b
          FROM s GROUP BY label)
    SELECT g.label, n_train, n_val,
           CASE WHEN n2a > 0 AND n2b > 0
                THEN dt / (sqrt(n2a) * sqrt(n2b)) END AS drift_cos,
           COALESCE(CASE WHEN n2a > 0 AND n2b > 0
                         THEN dt / (sqrt(n2a) * sqrt(n2b)) END
                    < {DRIFT_MIN_COS}, TRUE) AS is_drifted
    FROM g JOIN c ON g.label = c.label
    WHERE n_train > 0 AND n_val > 0
    ORDER BY g.label
    """


@query("embedding_split_drift", oracle=_drift_oracle())
def embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cosine between the two hash-split halves of the
    embedding corpus — the distribution-drift complement to
    split_leakage_check: leakage catches near-dup PAIRS straddling the
    split, this catches a split whose halves come from different
    DISTRIBUTIONS (time- or source-correlated assignment) even when no
    individual pair is similar.  Healthy random split → cosine ≈ 1 per
    label; ``is_drifted`` flags labels below {DRIFT_MIN_COS}.
    operators/similarity.py::split_centroid_drift documents the
    integer-exact determinism and the n·D-linear shape."""
    from mapreduceproject_spark.operators.similarity import split_centroid_drift

    emb = load_table(spark, sf_dir, "embeddings")
    return split_centroid_drift(
        emb, "vec_id", "embedding", "label", DRIFT_SALT, DRIFT_MIN_COS
    )


# -- per-dimension embedding health stats (round 5) ---------------------------
# The embedding-table health gate run before any similarity/clustering
# consumer: per dimension, n / mean / population variance / min / max.
# Catches dead dims (var 0), scale blowouts, and band drift in one pass.
# Plan shape: posexplode -> ONE 64-group aggregate (partial+final, map-
# side combined); zero joins, output O(dim).  Determinism: components
# micro-quantized (floor x*1e6, the functions/vectors contract), sums
# carried in decimal so Σq and Σq² are exact at any corpus size (Σq² of
# 1e12-scale terms wraps int64 at ~9M rows — SCALING known-cliff #5);
# the final mean/var doubles divide once, identically on both engines.


def _dim_stats_oracle() -> str:
    # EMB_DIM is similarity_queries' single source of truth for the
    # fixture dimensionality; reusing it keeps this oracle's range() in
    # lockstep with every other embedding consumer
    from mapreduceproject_spark.functions.vectors import QUANT_SCALE, duck_quantize
    from mapreduceproject_spark.plans.similarity_queries import EMB_DIM

    return f"""
    WITH q AS (
      SELECT {duck_quantize("embedding")} AS qv FROM embeddings
    ),
    g AS (
      SELECT d, qv[d] AS qd
      FROM q, range(1, {EMB_DIM + 1}) t(d)
    ),
    a AS (
      SELECT CAST(d AS BIGINT) AS d,
             CAST(COUNT(qd) AS BIGINT) AS n,
             SUM(CAST(qd AS HUGEINT)) AS s,
             SUM(CAST(qd * qd AS HUGEINT)) AS s2,
             MIN(qd) AS mn, MAX(qd) AS mx
      FROM g GROUP BY 1
    )
    SELECT d, n,
           CAST(s AS DOUBLE) / NULLIF(n, 0) / {QUANT_SCALE}.0 AS mean,
           (CAST(s2 AS DOUBLE) / NULLIF(n, 0)
              - (CAST(s AS DOUBLE) / NULLIF(n, 0)) * (CAST(s AS DOUBLE) / NULLIF(n, 0)))
             / {QUANT_SCALE * QUANT_SCALE}.0 AS variance,
           CAST(mn AS DOUBLE) / {QUANT_SCALE}.0 AS min_v,
           CAST(mx AS DOUBLE) / {QUANT_SCALE}.0 AS max_v
    FROM a
    """


@query("embedding_dim_stats", oracle=_dim_stats_oracle())
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health: n, mean, population variance,
    min, max over the micro-quantized components (see module comment for
    the determinism + overflow discipline)."""
    from mapreduceproject_spark.functions.vectors import QUANT_SCALE, quantize

    emb = load_table(spark, sf_dir, "embeddings")
    g = emb.select(
        F.posexplode(quantize(F.col("embedding"))).alias("d0", "qd")
    ).select((F.col("d0") + 1).cast("long").alias("d"), "qd")
    a = g.groupBy("d").agg(
        F.count("qd").cast("long").alias("n"),
        F.sum(F.col("qd").cast("decimal(19,0)")).alias("s"),
        F.sum((F.col("qd") * F.col("qd")).cast("decimal(19,0)")).alias("s2"),
        F.min("qd").alias("mn"),
        F.max("qd").alias("mx"),
    )
    # nullif: a dimension whose every component is NULL groups with
    # count(qd) = 0 — NULL stats on both engines, never an ANSI
    # DIVIDE_BY_ZERO abort (the functions/vectors discipline)
    n_safe = F.nullif(F.col("n"), F.lit(0))
    mean_q = F.col("s").cast("double") / n_safe
    return a.select(
        "d",
        "n",
        (mean_q / QUANT_SCALE).alias("mean"),
        (
            (F.col("s2").cast("double") / n_safe - mean_q * mean_q)
            / (QUANT_SCALE * QUANT_SCALE)
        ).alias("variance"),
        (F.col("mn").cast("double") / QUANT_SCALE).alias("min_v"),
        (F.col("mx").cast("double") / QUANT_SCALE).alias("max_v"),
    )


# -- redundant-dimension report (round 9) --------------------------------------
# The pairwise complement to embedding_dim_stats: top-K most-correlated
# dimension PAIRS over the quantized components.  |corr| ≈ 1 pairs are
# redundant storage/compute; blocks of them are encoder collapse.  The
# Spark side is the operators/similarity.py::dim_correlation_top Arrow
# Gram kernel (per-partition D×D partials, nothing row-scaled shuffled);
# the oracle pays the n·D²/2 unnest blowup the kernel exists to avoid —
# affordable at sf0.01 (500 × 2016 pair rows), which is exactly why the
# oracle is the oracle and the kernel is the plan.
REDUNDANT_DIMS_TOP = 20


def _redundant_dims_oracle() -> str:
    from mapreduceproject_spark.functions.vectors import duck_quantize
    from mapreduceproject_spark.plans.similarity_queries import EMB_DIM

    return f"""
    WITH q AS (
      SELECT {duck_quantize("embedding")} AS qv FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = {EMB_DIM}
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
    s AS (
      SELECT CAST(d AS BIGINT) AS dim,
             SUM(CAST(qv[d] AS HUGEINT)) AS s,
             SUM(CAST(qv[d] AS HUGEINT) * qv[d]) AS g2
      FROM q, range(1, {EMB_DIM + 1}) t(d) GROUP BY 1
    ),
    stats AS (
      SELECT dim,
             CAST(s AS DOUBLE) / n AS mean,
             greatest(
               CAST(g2 AS DOUBLE) / n
                 - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
               0.0
             ) AS var
      FROM s, nn
    ),
    p AS (
      SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
             SUM(CAST(qv[i] AS HUGEINT) * qv[j]) AS g
      FROM q, range(1, {EMB_DIM + 1}) t1(i), range(1, {EMB_DIM + 1}) t2(j)
      WHERE i < j GROUP BY 1, 2
    ),
    c AS (
      SELECT dim_i, dim_j,
             (CAST(g AS DOUBLE) / n - si.mean * sj.mean)
               / NULLIF(sqrt(si.var * sj.var), 0.0) AS corr
      FROM p, nn
      JOIN stats si ON si.dim = p.dim_i
      JOIN stats sj ON sj.dim = p.dim_j
    )
    SELECT dim_i, dim_j, corr FROM c
    WHERE corr IS NOT NULL
    ORDER BY abs(corr) DESC, dim_i, dim_j
    LIMIT {REDUNDANT_DIMS_TOP}
    """


@query("embedding_redundant_dims", oracle=_redundant_dims_oracle())
def embedding_redundant_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{REDUNDANT_DIMS_TOP} most-correlated embedding dimension pairs
    (Pearson corr over the micro-quantized components) — the
    redundant-dimension / encoder-collapse gate.  See
    operators/similarity.py::dim_correlation_top for the Arrow Gram-kernel
    plan shape and the integer-exactness envelope."""
    from mapreduceproject_spark.operators.similarity import dim_correlation_top
    from mapreduceproject_spark.plans.similarity_queries import EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    return dim_correlation_top(emb, "embedding", EMB_DIM, REDUNDANT_DIMS_TOP)


# -- Naive-Bayes quality classifier (round 10) --------------------------------
NB_TOP_N = 50


def _nb_oracle() -> str:
    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = duck_tokens("text")
    b = q.NB_BUCKETS
    return f"""
    WITH m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(CAST(list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT), 0) AS sum_len,
             len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...'))) AS n_symbol,
             len(list_filter([{stoplist}],
                 s -> list_contains(list_transform(toks, t -> lower(t)), s))) AS stop_hits
      FROM (SELECT doc_id, {toks} AS toks FROM documents)
    ),
    kept AS (
      SELECT doc_id,
             (NOT (n_words < {q.GOPHER_MIN_WORDS} OR n_words > {q.GOPHER_MAX_WORDS})
              AND NOT (sum_len < {q.GOPHER_MIN_MEAN_WORD_LEN} * n_words
                       OR sum_len > {q.GOPHER_MAX_MEAN_WORD_LEN} * n_words)
              AND NOT (n_symbol * 100 > {q.GOPHER_MAX_SYMBOL_RATIO_PCT} * n_words)
              AND NOT (stop_hits < {q.GOPHER_MIN_STOPWORD_HITS})) AS is_hi
      FROM m
    ),
    feats AS (
      SELECT doc_id AS id, ({duck_hash60("tok")}) % {b} AS bucket
      FROM {duck_token_rows("lower(text)", "doc_id")}
    ),
    pdb AS (
      SELECT f.id, k.is_hi, f.bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM feats f JOIN kept k ON k.doc_id = f.id GROUP BY 1, 2, 3
    ),
    bc AS (
      SELECT bucket,
             SUM(CASE WHEN is_hi THEN cnt ELSE 0 END) AS hi_b,
             SUM(CASE WHEN NOT is_hi THEN cnt ELSE 0 END) AS lo_b
      FROM pdb GROUP BY 1
    ),
    tot AS (SELECT SUM(hi_b) AS hi_t, SUM(lo_b) AS lo_t FROM bc),
    lam AS (
      SELECT bucket,
             CAST(floor(1000000 * (ln((hi_b + 1) / (hi_t + {b}))
                                   - ln((lo_b + 1) / (lo_t + {b})))) AS BIGINT)
               AS llr_b
      FROM bc, tot
    ),
    sc AS (
      SELECT id AS doc_id, is_hi AS teacher_kept,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(cnt * llr_b) AS BIGINT) AS llr_micro
      FROM pdb JOIN lam USING (bucket) GROUP BY 1, 2
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, teacher_kept, n_tokens, llr_micro
    FROM (SELECT *, row_number() OVER (ORDER BY llr_micro DESC, doc_id) AS rnk
          FROM sc)
    WHERE rnk <= {NB_TOP_N}
    """


@query("nb_quality_score", oracle=_nb_oracle())
def nb_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{NB_TOP_N} documents by hashed-unigram Naive-Bayes quality
    score, trained in-plan on the Gopher rule verdict — the learned
    quality scorer the round-9 verdict listed as the remaining public-
    recipe curation stage (rule teacher → linear student; exact integer
    log-count-ratio sums, the dsir_weights micro-quantization).  The
    teacher label rides along so the calibration pytest can tabulate
    score-sign vs rule-verdict agreement (operators/quality.py::
    nb_quality_scores).  Top-N via TakeOrdered + residual {NB_TOP_N}-row
    rank window — the dsir_importance_weights distributed-cut rule."""
    docs = load_table(spark, sf_dir, "documents")
    sc = q.nb_quality_scores(docs, "doc_id", "text", STOPWORDS)
    win = Window.orderBy(F.desc("llr_micro"), F.asc("doc_id"))
    return (
        sc.orderBy(F.desc("llr_micro"), F.asc("doc_id"))
        .limit(NB_TOP_N)
        .withColumn("rnk", F.row_number().over(win).cast("long"))
        .select("rnk", "doc_id", "teacher_kept", "n_tokens", "llr_micro")
    )
