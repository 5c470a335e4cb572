"""Embedding clustering: deterministic k-means (Lloyd's iterations).

The iterative-ML representative.  Every source of nondeterminism is
pinned so a DuckDB oracle reproduces the result bit-for-bit:
- init: centroids = the vectors with id < k (no random seeding);
- assignment: max quantized-integer cosine, ties → lowest centroid id;
- update: per-dimension arithmetic mean of the QUANTIZED coordinates —
  integer sums are exact and order-independent, and the final
  sum/count/1e6 double division is identical on every engine;
- fixed iteration count (no float-sensitive convergence test).

Scale shape (the same one MLlib's KMeans uses): the corpus never moves —
each iteration is one broadcast of k·dim scalars out, one partial+final
aggregate back.  Collecting the centroid table to the driver is O(k·dim)
(a few KB), not a data collect; with k=8, dim=64 a 100 TB corpus still
ships only 512 doubles per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.vectors import (
    QUANT_SCALE,
    prequantized_cosine,
    quantize,
    quantized_norm2,
)


def _assign(qvecs: DataFrame, centroids: DataFrame, assign: str = "brute") -> DataFrame:
    """(id, q, cluster_id, ccos): nearest centroid by quantized cosine,
    carrying the winning cosine (consumers that don't need it drop it).

    ``assign="twolevel"`` routes through coarse quantization
    (operators/similarity.py::assign_cells) — identical arithmetic
    (prequantized cosine is bit-equal to quantized_cosine), approximate
    only in which centroids get scored; the n·k fix for corpus-scaled k.
    """
    cents = centroids.select(
        "cid", quantize(F.col("cvec")).alias("cq")
    ).withColumn("cn2", quantized_norm2(F.col("cq")))
    if assign == "twolevel":
        from mapreduceproject_spark.operators.similarity import assign_cells

        vecs = qvecs.select(
            "id",
            F.col("q").alias("_q"),
            F.col("n2").alias("_n2"),
        )
        return assign_cells(vecs, cents, "id", nprobe=1, assign="twolevel").select(
            "id",
            F.col("_q").alias("q"),
            F.col("cid").alias("cluster_id"),
            F.col("cos").alias("ccos"),
        )
    # prequantized scoring on the dominant n*k term: qvecs carries its
    # once-computed (q, n2) and the k centroids quantize once per pass —
    # bit-identical to quantized_cosine(v, cvec) (the prequantized form's
    # contract), without re-quantizing both sides per (vector, centroid).
    scored = qvecs.crossJoin(F.broadcast(cents)).select(
        "id",
        "q",
        "cid",
        prequantized_cosine(
            F.col("q"), F.col("cq"), F.col("n2"), F.col("cn2")
        ).alias("cos"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "q", F.col("cid").alias("cluster_id"), F.col("cos").alias("ccos"))
    )


def kmeans_assignments(
    spark: SparkSession,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | str = 8,
    iterations: int = 2,
    assign: str = "brute",
) -> DataFrame:
    """Deterministic k-means, full final assignment: (id, q, cluster_id,
    ccos) after ``iterations`` Lloyd updates.  ``q`` is the quantized
    vector and ``ccos`` the cosine to the assigned centroid — downstream
    intra-cluster consumers (semantic dedup) score pairs without
    re-quantizing or re-ranking.

    ``k="auto"`` seeds max(16, n/125) centroids from an in-plan corpus
    count (operators/similarity.py::resolve_centroid_filter — the same
    policy as the IVF operators): the Lloyd loop itself is k-agnostic,
    so cluster count scales with the corpus without re-tuning — the
    fixed-k (n/k)^2 cliff SCALING.md measures on semantic dedup."""
    from mapreduceproject_spark.sources.catalog import spread_for_compute

    # spread: per-vector quantize + k cosine scores per Lloyd pass is the
    # expensive narrow stage; a single-split local scan would serialize it
    base = spread_for_compute(vectors).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # Every Lloyd iteration (and the final assignment) re-consumes qvecs;
    # persist so the scan+quantize pipeline runs once instead of
    # 2·iterations+1 times — the same corpus-caching MLlib's KMeans does.
    # n2 rides in the persisted frame so assignment passes never
    # re-aggregate the vector's own norm per centroid pairing.
    qvecs = (
        base.select("id", "v", quantize(F.col("v")).alias("q"))
        .withColumn("n2", quantized_norm2(F.col("q")))
        .persist()
    )

    from mapreduceproject_spark.operators.similarity import resolve_centroid_filter

    pick = resolve_centroid_filter(base, F.col("id"), k)
    centroids = pick(base).select(
        F.col("id").alias("cid"), F.col("v").alias("cvec")
    )

    for _ in range(iterations):
        assigned = _assign(qvecs, centroids, assign)
        # per-dimension exact-integer means -> new double centroids; the
        # k*dim result is driver-collected and re-broadcast as literals
        # (plan stays flat across iterations, like MLlib's implementation)
        means = (
            assigned.select("cluster_id", F.posexplode("q").alias("d", "qd"))
            .groupBy("cluster_id", "d")
            .agg(F.sum("qd").alias("s"), F.count("*").alias("c"))
            .select(
                "cluster_id",
                "d",
                (F.col("s").cast("double") / F.col("c") / QUANT_SCALE).alias("m"),
            )
        )
        rows = (
            means.groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))),
                    lambda st: st.m,
                ).alias("cvec")
            )
            .collect()
        )
        centroids = spark.createDataFrame(
            [(r["cluster_id"], r["cvec"]) for r in rows],
            "cid long, cvec array<double>",
        )

    return _assign(qvecs, centroids, assign)


def kmeans_quantized(
    spark: SparkSession,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | str = 8,
    iterations: int = 2,
    assign: str = "brute",
) -> DataFrame:
    """Deterministic k-means; returns (vec_id, cluster_id) after
    ``iterations`` Lloyd updates + one final assignment."""
    final = kmeans_assignments(spark, vectors, id_col, vec_col, k, iterations, assign)
    return final.select(F.col("id").alias("vec_id"), "cluster_id")
