"""Full-text relevance search: BM25 top-k scoring over a document corpus.

No analogue in the reference (its only text op is word-count style
aggregation, /root/reference/src/maple_juice.go); this is the standard
retrieval primitive a training-data pipeline uses for targeted corpus
probes (eval-set leakage hunts, topic audits, hard-negative mining).

Shape at 100 TB: the query set is tiny and broadcast; per-doc term
frequencies are scan-shaped (one explode + one groupBy keyed by doc);
document frequencies aggregate to vocabulary size (≪ corpus) and join
back broadcast.  The only corpus-sized shuffle is the (doc, term) tf
aggregation, and the final top-k is a per-query window over candidate
docs only (docs sharing ≥1 query term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.textfn import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[str, str]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = 10,
) -> DataFrame:
    """BM25 top-``topk`` documents per query.

    ``queries`` is [(query_id, query_text)]; terms are whitespace tokens,
    scored with the classic Robertson/Sparck-Jones formulation:

        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Output: (query_id, doc_id, score, rank), rank 1..topk per query by
    (score desc, doc_id asc) — the doc_id tiebreak makes results
    deterministic.  All arithmetic is IEEE double in a fixed expression
    shape so the DuckDB oracle reproduces scores (ln is the only
    transcendental; both engines are correctly-rounded in practice and
    the driver compares at 1e-6).
    """
    spark = docs.sparkSession
    qterms = [
        (qid, t) for qid, qtext in queries for t in dict.fromkeys(qtext.split())
    ]
    q = F.broadcast(
        spark.createDataFrame(qterms, "query_id string, term string").distinct()
    )
    terms = sorted({t for _, t in qterms})

    dtoks = tokens(F.col(text_col))
    # Round 11 (guide §2.4/§5): the retired shape tokenized the corpus
    # THREE times — a per-doc dl frame consumed twice (the tf⋈dl join +
    # the avgdl stats aggregate re-ran its scan+tokenize pipeline each)
    # plus the explode pass.  Now dl RIDES each exploded row (size of the
    # once-projected token array — constant per doc, folded into the tf
    # aggregate as max), which deletes the corpus-keyed dl join outright;
    # the stats aggregate keeps its own single pass.  Two tokenize scans
    # total, zero corpus-sized joins.  dl semantics unchanged: token-free
    # docs have no exploded rows, so they never reach tf — and never
    # reached the >0-filtered dl frame either.
    rows = docs.select(F.col(id_col).alias("doc_id"), dtoks.alias("_t")).select(
        "doc_id",
        F.size("_t").cast("long").alias("dl"),
        F.explode("_t").alias("term"),
    )
    # tf explodes only for the query terms (literal IN-filter runs
    # scan-side, so non-query terms never reach the tf shuffle).
    # persist: tf feeds BOTH the per-term document frequencies and the
    # scored join — without the barrier each consumer re-runs the corpus
    # tokenize+explode, doubling the dominant scan.  The table itself is
    # tiny ((matching docs × query terms) rows).
    tf = (
        rows.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.max("dl").alias("dl"),  # constant within the doc
        )
        .persist()
    )
    dft = F.broadcast(tf.groupBy("term").agg(F.count("*").cast("long").alias("df")))
    stats = F.broadcast(
        docs.select(F.size(dtoks).cast("long").alias("dl"))
        .filter(F.col("dl") > 0)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(q, "term")
        .join(dft, "term")
        .crossJoin(stats)
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank"))
    )
