"""Streaming suite: Structured Streaming jobs driven to completion with
Trigger.AvailableNow so the driver's batch oracle can check them
(streaming/jobs.py), plus the batch session_window operator.

Aggregations run in complete output mode (every window emitted once input
is exhausted — equivalent to the batch result on a finite source); dedup
runs in append mode (pass-through of first arrivals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceproject_spark.plans.analytics_queries import _ohlc_oracle
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table
from mapreduceproject_spark.streaming import jobs

_CENTS = "CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents"


@query(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS ws, event_type,
           COUNT(*) AS n_events, {_CENTS}
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window counts + exact cents per event_type, run as
    a real streaming query (file source → availableNow → memory sink)."""
    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    return jobs.run_to_df(jobs.tumbling_counts(ev), mode="complete")


@query(
    "stream_sliding_counts",
    oracle=f"""
    SELECT ws, event_type, COUNT(*) AS n_events, {_CENTS}
    FROM (
      SELECT unnest([tb, tb - INTERVAL 30 MINUTE]) AS ws, event_type, value
      FROM (SELECT time_bucket(INTERVAL '30 minutes', ts) AS tb, event_type, value
            FROM events)
    )
    GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in exactly
    two windows), streaming execution, exact-cents sums."""
    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    return jobs.run_to_df(jobs.sliding_counts(ev), mode="complete")


@query("stream_ohlc_downsample", oracle=_ohlc_oracle())
def stream_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch OHLC candle compactor (events_ohlc_downsample) run as a
    REAL streaming query: 1-hour tumbling windows, open/close by exact
    (µs, event_id, cents) struct extrema — ALGEBRAIC aggregates, so state
    per (window, type) is one struct pair + three longs, bounded and
    watermark-expirable.  The BATCH twin's oracle is shared verbatim —
    twin-ness is the property under test (availableNow completion must
    reproduce the batch result bit-for-bit, like stream_running_zscore)."""
    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    return jobs.run_to_df(jobs.ohlc_candles(ev), mode="complete")


@query(
    "stream_dedup_events",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type) — one state row
    per key, first arrival wins."""
    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    return jobs.run_to_df(jobs.stream_dedup(ev), mode="append")


@query(
    "session_window_stats",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, CAST(floor(value * 100) AS BIGINT) AS c FROM events
    ),
    x AS (
      SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTE
                     THEN 0 ELSE 1 END AS brk
      FROM e
    ),
    y AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(c) AS BIGINT) AS cents
    FROM y GROUP BY user_id, sid
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session windows (30-min gap) on the batch events table —
    the declarative twin of streaming/stateful.py's custom operator
    (oracle: classic gaps-and-islands SQL)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(jobs.cents(F.col("value"))).alias("cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "cents",
        )
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS purchase_id,
           b.event_id AS click_id,
           a.ts AS purchase_ts,
           b.ts AS click_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase' AND b.event_type = 'click'
     AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (last-hour click attribution per
    purchase): watermarks on both sides + an event-time bound in the join
    condition let Spark expire buffered rows — bounded state at any
    stream length.  Append mode: inner-join matches emit as they occur."""
    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    return jobs.run_to_df(jobs.interval_join_attribution(ev), mode="append")


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events stream joins a static customer
    dimension (broadcast per micro-batch — the standard streaming dim-join;
    the static side is re-resolvable so slowly-changing dims just work),
    then aggregates per market segment."""
    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    cust = load_table(s, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    # exact COUNT(DISTINCT) isn't supported inside streaming aggs; the join
    # runs streaming (enrichment per micro-batch), the distinct runs on the
    # materialized finite result
    out = jobs.run_to_df(joined.select("c_mktsegment", "user_id"), mode="append")
    return out.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "stream_running_zscore",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS c
      FROM events
    ),
    w AS (
      SELECT event_type, event_id, c,
             CAST(COUNT(c) OVER t AS BIGINT) AS n_prior,
             CAST(SUM(c) OVER t AS BIGINT) AS s,
             CAST(SUM(c * c) OVER t AS BIGINT) AS ss
      FROM e
      WINDOW t AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id, c, n_prior,
           CASE WHEN n_prior >= 2
                 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_prior)
                     / (n_prior - 1) > 0
                THEN (c - CAST(s AS DOUBLE) / n_prior)
                     / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_prior)
                            / (n_prior - 1))
           END AS zscore
    FROM w
    """,
)
def stream_running_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful online-anomaly operator run as a REAL
    streaming query (applyInPandasWithState, file source → availableNow):
    integer (n, Σ, Σ²) per-key state makes every emitted score
    bit-identical to the batch window oracle regardless of micro-batch
    slicing — the second driver-verified custom stateful operator
    (streaming/stateful.py::running_zscore)."""
    from mapreduceproject_spark.streaming import stateful

    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    return jobs.run_to_df(stateful.running_zscore(ev), mode="append")


@query(
    "stream_windowed_topk",
    oracle="""
    SELECT ws, event_type, cents, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT ws, event_type, cents,
             row_number() OVER (PARTITION BY ws ORDER BY cents DESC, event_type) AS rnk
      FROM (SELECT date_trunc('hour', ts) AS ws, event_type,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM events GROUP BY 1, 2))
    WHERE rnk <= 3
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour by exact-cents revenue: the
    streaming leaderboard pattern.  Ranking inside a streaming agg isn't
    supported (it would need the window CLOSED), so the aggregation runs
    as a real streaming query (complete mode — same bounded state as
    stream_tumbling_counts) and the rank is a finishing batch pass over
    the materialized windows; on a live stream the same rank runs per
    trigger in foreachBatch against the closed windows."""
    from pyspark.sql import Window

    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir)
    agg = jobs.run_to_df(jobs.tumbling_counts(ev), mode="complete")
    w = Window.partitionBy("ws").orderBy(F.desc("cents"), F.asc("event_type"))
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("ws", "event_type", "cents", "rnk")
    )


@query(
    "stream_upsert_latest",
    oracle="""
    SELECT user_id, event_type, ts, event_id
    FROM (SELECT user_id, event_type, ts, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def stream_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized view: foreachBatch keyed upsert maintaining
    the latest row per user across micro-batches in a bucket-partitioned
    parquet state table (streaming/jobs.py::upsert_latest_per_key — each
    batch reads and atomically swaps only the buckets its keys hash
    into, per-batch cost O(touched buckets) not O(table)).  Run with
    availableNow the converged table must equal the batch latest-per-key
    window — the upsert twin of the dedup/sessionizer stateful family.
    event_id is the explicit tie-break so same-timestamp rows resolve
    deterministically (matching the oracle).  State lands in a
    per-invocation temp dir, eagerly checkpointed off it so the dir can
    be removed before returning (the production shape is a fixed path
    reused every trigger, or MERGE INTO on object stores)."""
    import shutil
    import tempfile

    s = jobs.streaming_session(spark)
    ev = jobs.read_events_stream(s, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    root = tempfile.mkdtemp(prefix="upsert_state_")
    try:
        out = jobs.upsert_latest_per_key(
            ev, spark, f"{root}/state", ["user_id"], "ts",
            tiebreak_cols=["event_id"],
        )
        # materialize off the temp table so the dir is deletable now
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# -- streaming ingest near-dup gate (round 6) ---------------------------------
# The streaming twin of dedup_incremental_minhash: the same 10% "new
# arrivals" content-hash slice, but delivered as INCR_STREAM_BATCHES
# micro-batches (a second deterministic content hash assigns each new
# doc a batch) against a PERSISTED corpus bucket index that every batch
# checks and then joins (streaming/jobs.py::incremental_minhash_stream).
# A doc therefore pairs with everything ingested STRICTLY earlier —
# bootstrap corpus or a previous micro-batch — which is the semantics a
# real continuously-ingesting gate has, and exactly what the oracle's
# ord-comparison expresses.  With one batch the result equals the batch
# twin (pytest pins it).
INCR_STREAM_BATCHES, INCR_STREAM_SALT = 3, "|ingest-order"


def _incr_stream_oracle() -> str:
    from mapreduceproject_spark.functions.hashing import duck_hash60
    from mapreduceproject_spark.plans.dedup_queries import (
        INCR_NEW_PCT,
        INCR_SALT,
        JACCARD_THR,
        _minhash_prefix,
    )

    arrival = duck_hash60(f"text || '{INCR_SALT}'")
    order = duck_hash60(f"text || '{INCR_STREAM_SALT}'")
    return f"""
    WITH {_minhash_prefix()},
    flags AS (
      SELECT doc_id AS id,
             CASE WHEN {arrival} % 100 < {INCR_NEW_PCT}
                  THEN {order} % {INCR_STREAM_BATCHES} ELSE -1 END AS ord
      FROM documents
    ),
    pairs AS (
      SELECT DISTINCT a.id AS new_id, b.id AS prior_id
      FROM bands a
      JOIN flags fa ON fa.id = a.id AND fa.ord >= 0
      JOIN bands b ON a.band = b.band AND a.sig = b.sig
      JOIN flags fb ON fb.id = b.id AND fb.ord < fa.ord
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT p.new_id, p.prior_id, COUNT(*) AS both
      FROM pairs p
      JOIN sh x ON x.id = p.new_id
      JOIN sh y ON y.id = p.prior_id AND y.h = x.h
      GROUP BY 1, 2
    )
    SELECT i.new_id, i.prior_id,
           i.both / (na.n + nb.n - i.both) AS jaccard
    FROM inter i
    JOIN sizes na ON na.id = i.new_id
    JOIN sizes nb ON nb.id = i.prior_id
    WHERE i.both / (na.n + nb.n - i.both) >= {JACCARD_THR}
    """


@query("dedup_incremental_stream", oracle=_incr_stream_oracle())
def dedup_incremental_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest near-dup gate: the {INCR_NEW_PCT}%% new-arrivals
    slice replayed as {INCR_STREAM_BATCHES} deterministic micro-batches
    (file-per-batch, maxFilesPerTrigger=1, availableNow) through
    incremental_minhash_stream — each batch LSH-joins the persisted
    corpus bucket index and is appended to it, so output pairs are
    (new doc, any STRICTLY-earlier-ingested doc) at exact word-shingle
    jaccard >= threshold.  Per-batch cost follows batch size; the index
    is append-only (generation dirs, object-store-safe); replayed epochs
    overwrite their own dirs, so a crash anywhere is repaired by the
    checkpoint (crash pytest in tests/test_streaming.py)."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from mapreduceproject_spark.functions.hashing import hash60
    from mapreduceproject_spark.plans.dedup_queries import (
        INCR_NEW_PCT,
        INCR_SALT,
        JACCARD_THR,
        MINHASH_BANDS,
        MINHASH_N,
        MINHASH_SEED,
        SHINGLE_K,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_new = (
        hash60(F.concat(F.col("text"), F.lit(INCR_SALT))) % 100 < INCR_NEW_PCT
    )
    corpus = docs.filter(~is_new)
    new = docs.filter(is_new).withColumn(
        "_b",
        hash60(F.concat(F.col("text"), F.lit(INCR_STREAM_SALT)))
        % INCR_STREAM_BATCHES,
    )
    root = tempfile.mkdtemp(prefix="incr_stream_")
    try:
        stage = os.path.join(root, "stage")
        os.makedirs(stage)
        base = int(time.time())
        # ONE write job for every batch file (round 10, guide §2.6 job
        # accounting): partitionBy("_b") + repartition on it lands each
        # batch's rows in exactly one part file under _b=<k>/, replacing
        # {INCR_STREAM_BATCHES} separate filter+coalesce(1) scans of the
        # new-arrivals slice.  Batch contents are identical (same _b
        # assignment), and the move+utime below pins the same
        # (modification time, path) micro-batch order as before.
        tmp = os.path.join(root, "w")
        new.repartition(F.col("_b")).write.partitionBy("_b").parquet(tmp)
        for b in range(INCR_STREAM_BATCHES):
            parts = glob.glob(os.path.join(tmp, f"_b={b}", "part-*.parquet"))
            if not parts:  # empty batch: nothing to ingest, no file
                continue
            dst = os.path.join(stage, f"batch-{b}.parquet")
            shutil.move(parts[0], dst)
            # the file source orders by (modification time, path): pin
            # both so micro-batch order IS the deterministic batch index
            os.utime(dst, (base + 2 * b, base + 2 * b))
        s = jobs.streaming_session(spark)
        stream = (
            s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(stage, "*.parquet"))
        )
        out = jobs.incremental_minhash_stream(
            stream,
            spark,
            os.path.join(root, "state"),
            os.path.join(root, "ckpt"),
            corpus,
            "doc_id",
            "text",
            num_hashes=MINHASH_N,
            bands=MINHASH_BANDS,
            shingle_k=SHINGLE_K,
            threshold=JACCARD_THR,
            seed=MINHASH_SEED,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
