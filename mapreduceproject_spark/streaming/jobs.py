"""Structured Streaming jobs over the events table.

The reference has no streaming at all (SURVEY §2.6); this is the
north-star extension.  Each job is declared against ``readStream`` so the
same plan runs incrementally on a live source; the registry entries drive
them with ``Trigger.AvailableNow`` into a memory sink, which processes
the finite fixture exactly once and returns a normal DataFrame — so the
driver's DuckDB oracle can check streaming results like any batch query.

Scale notes: tumbling/sliding aggregations are the streaming analogue of
a partial-agg shuffle keyed by (window, key) — state size is bounded by
windows × keys, and the watermark bounds how long state lives.  Streaming
dedup keeps one state row per key (bound it with a watermark in
production).  Value sums are quantized to integer cents so results are
engine-exact (floor(value*100) on identical doubles).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# With spark.sql.legacy.parquet.nanosAsLong the fixture's TIMESTAMP(NANOS)
# column arrives as a nanosecond long (same handling as sources/catalog.py).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the events fixture (ts → timestamp_ntz)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # glob (not a bare file path): the file stream source requires its
    # basePath to be a directory, and the pattern keeps it scoped to the
    # events table inside the shared fixture dir.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .parquet(f"{sf_dir.rstrip('/')}/events*.parquet")
    )
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # wall time is identical to the batch catalog's timestamp_ntz view.
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp")
    )


def cents(col: F.Column) -> F.Column:
    """Exact integer cents: floor(value*100) on identical doubles is
    engine-identical, unlike a floating SUM whose result depends on
    reduction order."""
    return F.floor(col * 100).cast("long")


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: row count + cents sum."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum(cents(F.col("value"))).alias("cents"))
        .select(
            F.col("w.start").alias("ws"),
            "event_type",
            "n_events",
            "cents",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes, per event_type."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum(cents(F.col("value"))).alias("cents"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "cents")
    )


def stream_dedup(events: DataFrame) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): one state row per
    key, emits first arrival — projected to the key so output order of
    arrival doesn't leak into results."""
    return events.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


def interval_join_attribution(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding hour — the canonical last-touch
    attribution join.

    Both sides carry watermarks and the join condition bounds the two
    event times against each other, so Spark can expire buffered state:
    a click older than (purchase watermark − 1 h) can never match again
    and is dropped.  Without the time bound the state store would grow
    forever — this is THE stream-stream-join scale contract.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.click_ts <= purchases.purchase_ts),
        "inner",
    ).select("user_id", "purchase_id", "click_id", "purchase_ts", "click_ts")


def run_to_df(
    stream: DataFrame,
    spark: SparkSession,
    mode: str,
    state_partitions: int = 8,
) -> DataFrame:
    """Execute a finite stream with AvailableNow into a memory sink and
    return the materialized result table.

    ``state_partitions`` bounds the stateful-operator partition count for
    this run (state partitioning is per-job and frozen at the first
    checkpoint, so it is a parameter here, not a session constant).  The
    default-8 suits a finite local replay: every state partition costs
    per-batch store/commit file I/O, which dominates when state is small —
    a 2-store stream-stream join measured 3× faster at 8 than at 32 on
    local[32].  A production continuous job sizes this to key cardinality
    and executor count instead (hundreds+), exactly like
    ``spark.sql.shuffle.partitions`` for batch — pass it explicitly."""
    name = f"snk_{uuid.uuid4().hex[:10]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def upsert_latest_per_key(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """foreachBatch keyed upsert: maintain the latest row per key in a
    parquet table across micro-batches.

    The pattern behind every streaming dim/state table: each batch merges
    into the current table with a latest-timestamp-wins window.  The merge
    writes to a TEMP directory and swaps it in by rename — the job never
    deletes the files it is reading (cache is not a durability guarantee:
    a lost executor would recompute cached partitions from just-deleted
    files), and a crash mid-swap leaves either the old or the new table,
    never a hole.  Rename is atomic on local FS and HDFS; on object
    stores use Delta/Iceberg MERGE INTO instead, which is what this whole
    body collapses to there.  Ties on ``ts_col`` break by the key
    columns, deterministically.
    """
    import os
    import shutil

    from pyspark.sql import Window

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        s = batch.sparkSession
        try:
            current = s.read.parquet(path)
            unioned = current.unionByName(batch)
        except Exception:  # first batch: no table yet
            unioned = batch
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc(ts_col), *[F.asc(c) for c in key_cols]
        )
        merged = (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        swap = uuid.uuid4().hex[:8]
        tmp = f"{path}.tmp-{swap}"
        merged.write.mode("overwrite").parquet(tmp)  # reads old, writes new
        old = f"{path}.old-{swap}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(path)
