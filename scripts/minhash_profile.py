"""Attribute dedup_minhash_lsh's third-decade superlinearity (round-8).

SCALING.md round-6 measured 25.7 s -> 309.6 s (12x for 10x rows) on the
100x -> 1000x fixtures and flagged it unexplained.  The two suspects the
verdict names: (a) candidate-pair DENSITY (per-bucket quadratics from
the shared base corpus's shingle structure) vs (b) single-JVM SPILL/GC.
This script measures both directly, per fixture decade:

- stage-by-stage wall-clock (shingle / signature / bucket / pair / verify)
  with each intermediate persisted, so the growth localizes to a stage;
- the bucket-occupancy histogram (log2 size classes), max bucket size,
  and the implied pre-distinct pair volume  sum over buckets of C(n,2) —
  if THIS grows ~100x per decade while rows grow 10x, it's density;
- replica-spine analysis of the largest buckets: members' base-doc ids
  (id % n_base) reveal whether deep buckets are 1000 replicas of ONE base
  doc — i.e. shingles the fixture's letter-permutation cannot decorrelate
  (digits / punctuation survive F.translate untouched), near-identical
  boilerplate in miniature;
- end-to-end uncapped wall (the faithful SCALING.md number) plus the JVM
  spill/GC counters around it from the UI REST API (memoryBytesSpilled /
  diskBytesSpilled / totalGCTime deltas) — if spill is ~0, (b) is dead;
- the same pipeline at max_bucket_size=256 (the shipped pressure valve,
  exercised at defaults as the round-6 verdict asks): wall + pair recall
  vs the uncapped run (capped output is a subset by construction, so
  recall = capped_rows / uncapped_rows).

Usage:
  SPARK_GRAFT_SCALE_REPLICAS=100 python scripts/minhash_profile.py
(fixture must already exist: scripts/scaling_run.py --build-only)

Prints one JSON line and merges it into
measurements/minhash_profile_latest.json keyed by fixture.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
FIXTURE = str(
    Path(__file__).resolve().parent.parent / ".scaling" / f"sf{REPLICAS}x"
)
ARTIFACT = str(
    Path(__file__).resolve().parent.parent
    / "measurements"
    / "minhash_profile_latest.json"
)
UI_PORT = 4057

# the registered query's exact knobs (plans/dedup_queries.py:34)
NUM_HASHES, BANDS, SHINGLE_K, THRESHOLD, SEED = 12, 4, 3, 0.5, 42
CAP = 256  # the pressure-valve setting to exercise


def ui_counters(app_id: str) -> dict:
    """Cumulative spill/GC counters from the UI REST API (local mode)."""
    base = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
    out = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0, "totalGCTime": 0}
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        for st in json.load(r):
            out["memoryBytesSpilled"] += st.get("memoryBytesSpilled", 0)
            out["diskBytesSpilled"] += st.get("diskBytesSpilled", 0)
    with urllib.request.urlopen(f"{base}/executors") as r:
        for ex in json.load(r):
            out["totalGCTime"] += ex.get("totalGCTime", 0)
    return out


def delta(a: dict, b: dict) -> dict:
    return {k: b[k] - a[k] for k in a}


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators import dedup as dd
    from mapreduceproject_spark.session import get_spark
    from mapreduceproject_spark.sources.catalog import load_table

    spark = get_spark(
        app_name="minhash-profile",
        master="local[32]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    app_id = spark.sparkContext.applicationId
    docs = load_table(spark, FIXTURE, "documents")
    res: dict = {"fixture": FIXTURE, "replicas": REPLICAS}

    # --- faithful end-to-end runs first (the SCALING.md-comparable walls),
    # bracketed by spill/GC snapshots -------------------------------------
    for label, cap in (("uncapped", None), (f"cap{CAP}", CAP)):
        c0 = ui_counters(app_id)
        t0 = time.time()
        n = dd.minhash_lsh_dedup(
            docs, "doc_id", "text",
            num_hashes=NUM_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
            threshold=THRESHOLD, seed=SEED, max_bucket_size=cap,
        ).count()
        res[f"e2e_{label}_sec"] = round(time.time() - t0, 1)
        res[f"e2e_{label}_pairs"] = n
        res[f"e2e_{label}_spill"] = delta(c0, ui_counters(app_id))
    res["cap_pair_recall"] = (
        round(res[f"e2e_cap{CAP}_pairs"] / res["e2e_uncapped_pairs"], 4)
        if res["e2e_uncapped_pairs"]
        else None
    )

    # --- staged pipeline: localize the growth ----------------------------
    stages: dict = {}
    t = time.time()
    hashed = dd.shingle_hashes(docs, "doc_id", "text", SHINGLE_K).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stages["shingle_rows"] = hashed.count()
    stages["shingle_sec"] = round(time.time() - t, 1)

    t = time.time()
    sigs = dd.minhash_signatures(hashed, NUM_HASHES, SEED).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stages["signed_docs"] = sigs.count()
    stages["signature_sec"] = round(time.time() - t, 1)

    t = time.time()
    buckets = dd.lsh_band_buckets(sigs, NUM_HASHES, BANDS).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stages["bucket_rows"] = buckets.count()
    stages["bucket_sec"] = round(time.time() - t, 1)

    # occupancy histogram + implied pre-distinct pair volume
    t = time.time()
    sizes = buckets.groupBy("band", "sig").agg(F.count("*").alias("n"))
    hist = (
        sizes.groupBy(F.ceil(F.log2("n")).cast("int").alias("log2_size"))
        .agg(
            F.count("*").alias("buckets"),
            F.sum("n").alias("rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("pairs"),
        )
        .orderBy("log2_size")
        .collect()
    )
    stages["occupancy"] = [
        {"log2_size": r["log2_size"], "buckets": r["buckets"],
         "rows": r["rows"], "pairs": r["pairs"]}
        for r in hist
    ]
    stages["implied_pairs"] = int(sum(r["pairs"] for r in hist))
    stages["max_bucket"] = int(
        sizes.agg(F.max("n")).collect()[0][0] or 0
    )
    stages["histogram_sec"] = round(time.time() - t, 1)

    # replica-spine analysis: are the deepest buckets one base doc x many
    # replicas?  base id = id % n_base (fixture ids are base + k*n_base).
    n_base = stages["signed_docs"] // REPLICAS
    t = time.time()
    top = (
        buckets.join(
            sizes.orderBy(F.desc("n")).limit(20), ["band", "sig"]
        )
        .groupBy("band", "sig")
        .agg(
            F.count("*").alias("size"),
            F.countDistinct((F.col("_id") % n_base)).alias("distinct_base"),
        )
        .orderBy(F.desc("size"))
        .collect()
    )
    stages["top_buckets"] = [
        {"size": r["size"], "distinct_base": r["distinct_base"]} for r in top
    ]
    stages["top_buckets_sec"] = round(time.time() - t, 1)

    t = time.time()
    pairs = dd.candidate_pairs_from_buckets(buckets).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stages["distinct_pairs"] = pairs.count()
    stages["pair_join_sec"] = round(time.time() - t, 1)

    t = time.time()
    stages["verified_pairs"] = dd.verify_jaccard(pairs, hashed, THRESHOLD).count()
    stages["verify_sec"] = round(time.time() - t, 1)

    for df in (hashed, sigs, buckets, pairs):
        df.unpersist()
    res["stages"] = stages

    line = json.dumps(res)
    print(line)
    merged = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            merged = json.load(fh)
    merged[f"sf{REPLICAS}x"] = res
    with open(ARTIFACT, "w") as fh:
        json.dump(merged, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
