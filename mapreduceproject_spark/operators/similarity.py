"""Similarity search (approximate nearest neighbor) over embedding columns.

No analogue exists in the reference (its only lookup is exact filename →
replica set, /root/reference/src/master_globals.go:8-11); this is the
BASELINE.json north-star extension for training-data pipelines.

Two strategies, one verified against the other:

- **Brute force** (the correctness baseline): broadcast the (small) query
  set against the corpus, score every pair, keep top-k per query with a
  window.  At 100 TB the corpus side stays partition-parallel and nothing
  shuffles except the final per-query top-k — the classic
  "small-queries × huge-corpus" scan pattern.
- **IVF** (the scale path): assign corpus vectors to the nearest of C
  deterministic centroids (one cheap broadcast pass), then probe only the
  ``nprobe`` nearest cells per query — scoring cost drops by ~C/nprobe at
  the standard IVF recall tradeoff.

All cosines use the integer-quantized path (functions/vectors.py) so DuckDB
oracles reproduce scores — and therefore ranks — bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.vectors import quantized_cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Output: (query_id, neighbor_id, cosine, rank), self-matches excluded.
    ``queries`` must be broadcast-small; the corpus scan is embarrassingly
    parallel and the only shuffle is the per-query window top-k.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
    )
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
        .crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_cosine(F.col("_qv"), F.col("_v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    num_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe the ``nprobe`` max-cosine cells.

    Centroids are the corpus vectors with id < ``num_centroids`` —
    deterministic seeds so the oracle replicates cell assignment exactly.
    Corpus→cell is one broadcast pass; query→probe list likewise; the
    candidate join shuffles on the cell id, sized ~nprobe/C of brute force.
    """
    centroids = F.broadcast(
        corpus.filter(F.col(id_col) < num_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        )
    )

    corpus_scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
        .crossJoin(centroids)
        .select(
            "neighbor_id",
            "_v",
            "cid",
            quantized_cosine(F.col("_v"), F.col("cvec")).alias("ccos"),
        )
    )
    wc = Window.partitionBy("neighbor_id").orderBy(F.desc("ccos"), F.asc("cid"))
    cells = (
        corpus_scored.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "_v", "cid")
    )

    probes = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
        .crossJoin(centroids)
        .select(
            "query_id",
            "_qv",
            "cid",
            quantized_cosine(F.col("_qv"), F.col("cvec")).alias("ccos"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probed = (
        probes.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "_qv", "cid")
    )

    cand = (
        probed.join(cells, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_cosine(F.col("_qv"), F.col("_v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )
