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
aggregate back.  For bounded k the centroid table round-trips the driver
as O(k·dim) literals (a few KB); for corpus-scaled k (``k="auto"`` past
its cap-adjacent sizes) the table stays a DISTRIBUTED DataFrame
materialized by localCheckpoint — no collect-as-rows, no literal
re-plan; the assignment broadcast still transits the driver, bounded by
the auto-k cap, so max driver bytes is bounded independent of corpus
size (see kmeans_assignments' driver-payload contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    # round 11 (guide §2.4, the knn_edges_ivf round-10 pattern): the
    # winner per id is ONE max(struct) hash aggregate with map-side
    # partials instead of an exchange + full sort + WindowExec over all
    # n·k scored rows — and k-means runs this once per Lloyd pass plus
    # the final assignment.  max(struct(cos, -cid)) picks the same
    # (cos desc, cid asc) winner as the row_number window: a NULL cos
    # field (zero-norm vector) compares smallest, matching desc-NULLS-
    # LAST; an all-NULL id falls through to max(-cid) = lowest cid,
    # exactly the window's tie order.  `q` rides the partial aggregate
    # at one row per id (pytest + oracle parity pin the equality).
    return (
        scored.groupBy("id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos"),
                    (-F.col("cid")).alias("ncid"),
                    F.col("cid"),
                    F.col("q"),
                )
            ).alias("best")
        )
        .select(
            "id",
            F.col("best.q").alias("q"),
            F.col("best.cid").alias("cluster_id"),
            F.col("best.cos").alias("ccos"),
        )
    )


def kmeans_assignments(
    spark: SparkSession,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | str = 8,
    iterations: int = 2,
    assign: str = "brute",
    max_literal_centroids: int = 512,
) -> DataFrame:
    """Deterministic k-means, full final assignment: (id, q, cluster_id,
    ccos) after ``iterations`` Lloyd updates.  ``q`` is the quantized
    vector and ``ccos`` the cosine to the assigned centroid — downstream
    intra-cluster consumers (semantic dedup) score pairs without
    re-quantizing or re-ranking.

    ``k="auto"`` resolves the centroid count with the shared piecewise
    policy (operators/similarity.py::auto_centroid_count — linear to a
    knee, then sqrt(n), hard-capped): cluster count scales with the
    corpus without re-tuning — the fixed-k (n/k)^2 cliff SCALING.md
    measures on semantic dedup — while the cap bounds every k-sized
    structure independent of n.

    Driver payload contract: per Lloyd iteration the k·dim centroid
    table is collected and re-broadcast as literals ONLY while
    k <= ``max_literal_centroids`` (a flat, cheap plan: <= 512·dim·8
    bytes ≈ 262 KB at dim=64 — MLlib's own pattern at bounded k).
    Above that, centroids stay a DISTRIBUTED DataFrame, materialized
    per iteration with localCheckpoint to truncate lineage — no
    collect-as-rows and no literal re-plan.  (The assignment join still
    BROADCASTS the centroid table, and Spark builds broadcast relations
    through the driver — so centroid bytes transit the driver once per
    assignment either way; what bounds them is the auto-k cap, ≈33.5 MB
    at AUTO_MAX_CENTROIDS=65536 × dim=64 doubles, independent of corpus
    size.  A custom uncapped k sizes that broadcast at k·dim·8 bytes —
    size driver/executor memory accordingly.)  The round-4 verdict's
    third-decade hazard — auto-k at n=1e9 used to collect ~8M centroids
    per iteration AND re-parse them as plan literals — is closed by the
    cap plus this carrier.  The distributed carrier
    is measured FREE at the crossover scale — warmup-controlled at the
    100x fixture (n=200k, auto k=1600, dim=64): literal 59.9 s vs
    distributed 56.6 s (`measurements/scale_100x_latest.json::
    kmeans_autok`) — so the 512 default trades nothing for the
    driver-bytes bound.  Both paths run identical arithmetic; a pytest
    pins result equality."""
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

    from mapreduceproject_spark.operators.similarity import auto_centroid_count

    # resolve k driver-side: one long (the materializing count also warms
    # the persisted corpus every Lloyd pass reuses).  Same arithmetic as
    # the in-plan "auto" cut (auto_centroid_count is its mirror), so the
    # seeded set is identical either way.
    k_eff = auto_centroid_count(qvecs.count()) if k == "auto" else int(k)
    centroids = base.filter(F.col("id") < k_eff).select(
        F.col("id").alias("cid"), F.col("v").alias("cvec")
    )

    for _ in range(iterations):
        assigned = _assign(qvecs, centroids, assign)
        # per-dimension exact-integer means -> new double centroids
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
        new_cents = means.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))),
                lambda st: st.m,
            ).alias("cvec")
        )
        if k_eff <= max_literal_centroids:
            # small k: driver-collect and re-broadcast as literals (plan
            # stays flat across iterations, like MLlib's implementation);
            # bounded at max_literal_centroids·dim·8 bytes by the gate
            rows = new_cents.collect()
            centroids = spark.createDataFrame(
                [(r["cluster_id"], r["cvec"]) for r in rows],
                "cid long, cvec array<double>",
            )
        else:
            # corpus-scaled k: centroids stay a distributed frame — no
            # collect-as-rows, no literal re-plan (they still transit
            # the driver inside the assignment join's BroadcastExchange,
            # bounded by the auto-k cap; see docstring).  localCheckpoint
            # materializes and truncates lineage so the per-iteration
            # plan doesn't nest.
            # localCheckpoint trades fault-tolerance for speed (executor
            # loss loses the truncated lineage): right for local/single-
            # box; on a long-lived cluster job point
            # spark.sparkContext.setCheckpointDir at an HDFS/object path
            # and swap this for .checkpoint(eager=True) — same semantics,
            # replicated storage.
            centroids = (
                new_cents.select(
                    F.col("cluster_id").alias("cid"), "cvec"
                ).localCheckpoint(eager=True)
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
    max_literal_centroids: int = 512,
) -> DataFrame:
    """Deterministic k-means; returns (vec_id, cluster_id) after
    ``iterations`` Lloyd updates + one final assignment."""
    final = kmeans_assignments(
        spark, vectors, id_col, vec_col, k, iterations, assign,
        max_literal_centroids,
    )
    return final.select(F.col("id").alias("vec_id"), "cluster_id")
