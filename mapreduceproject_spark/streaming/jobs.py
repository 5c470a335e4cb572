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

# Fallback schema for fixtures whose ts is TIMESTAMP(NANOS): under
# spark.sql.legacy.parquet.nanosAsLong that column arrives as a nanosecond
# long (same handling as sources/catalog.py).
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
    """File-source streaming read of the events fixture.

    The fixture's ts physical type is not under our control
    (TIMESTAMP(MICROS) in current driver-generated data, TIMESTAMP(NANOS)
    in earlier rounds), and the file stream source needs an explicit
    schema — so probe the batch reader's resolved schema (driver-side
    footer read, no data scan) and branch: a Spark-native timestamp
    streams as-is; a nanosAsLong bigint gets the ns→µs conversion.
    Assuming one scale silently shifts every event time 1000× on the
    other kind of file — windows collapse and interval joins explode.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    batch_schema = spark.read.parquet(path).schema
    nanos = dict((f.name, f.dataType.simpleString()) for f in batch_schema).get("ts") == "bigint"
    # glob (not a bare file path): the file stream source requires its
    # basePath to be a directory, and the pattern keeps it scoped to the
    # events table inside the shared fixture dir.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA if nanos else batch_schema)
        .parquet(f"{sf_dir.rstrip('/')}/events*.parquet")
    )
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # wall time is identical to the batch catalog's timestamp_ntz view.
    if nanos:
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp")
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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


def ohlc_candles(events: DataFrame) -> DataFrame:
    """1-hour tumbling OHLC candles per event_type — the streaming twin of
    plans/analytics_queries.py::events_ohlc_downsample (same column names,
    same oracle): open/close resolved by min/max over an exact
    (µs, event_id, cents) struct, which is ALGEBRAIC, so the streaming
    state per (window, type) is one struct pair + three longs — bounded
    state, watermark-expirable, no per-event buffering."""
    us = F.unix_micros(F.col("ts"))
    key = F.struct(
        us.alias("us"),
        F.col("event_id").alias("id"),
        cents(F.col("value")).alias("c"),
    )
    c = cents(F.col("value"))
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min(key).alias("o"),
            F.max(c).alias("hi"),
            F.min(c).alias("lo"),
            F.max(key).alias("cl"),
            F.sum(c).alias("vol"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            (F.col("o.c").cast("double") / 100.0).alias("open"),
            (F.col("hi").cast("double") / 100.0).alias("high"),
            (F.col("lo").cast("double") / 100.0).alias("low"),
            (F.col("cl.c").cast("double") / 100.0).alias("close"),
            (F.col("vol").cast("double") / 100.0).alias("volume"),
            "n_events",
        )
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


def streaming_session(spark: SparkSession, state_partitions: int = 8) -> SparkSession:
    """A cloned session (shared SparkContext + catalog cache, isolated SQL
    conf) for running one streaming job.

    Streams built on the clone plan against its ``shuffle.partitions``
    without ever touching the parent's — a batch query planned concurrently
    on the parent keeps its own parallelism.  (Mutate-and-restore on the
    shared session was round 2's approach; the restore ran in ``finally``
    but any concurrent batch plan inside the window silently got the
    streaming value.)
    """
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    return s


def run_to_df(
    stream: DataFrame,
    spark: SparkSession | None = None,
    mode: str = "append",
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
    ``spark.sql.shuffle.partitions`` for batch — pass it explicitly.

    The conf is set on the STREAM's own session (``spark`` is accepted for
    backwards compatibility but ignored); build the stream on
    :func:`streaming_session` so the setting never leaks to the parent.
    """
    sess = stream.sparkSession
    name = f"snk_{uuid.uuid4().hex[:10]}"
    prev = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
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
        sess.conf.set("spark.sql.shuffle.partitions", prev)
    return sess.table(name)


def upsert_latest_per_key(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    ts_col: str,
    num_buckets: int = 16,
    tiebreak_cols: list[str] | None = None,
    commit: str = "rename",
) -> DataFrame:
    """foreachBatch keyed upsert: maintain the latest row per key in a
    parquet table across micro-batches.

    The pattern behind every streaming dim/state table: each batch merges
    into the current table with a latest-timestamp-wins window.  The table
    is laid out partitioned by ``_kb = pmod(xxhash64(keys), num_buckets)``
    so a batch only READS and REWRITES the buckets its keys hash into —
    per-batch cost is O(touched buckets), not O(table), and untouched
    buckets' files are never opened or replaced (byte-identical across
    batches; tests prove it).  Size ``num_buckets`` so one bucket ≈ a few
    parquet files at the target state size.

    Durability: each touched bucket is merged into a TEMP directory first
    and swapped in by rename — the job never deletes files it is reading
    (cache is not a durability guarantee: a lost executor would recompute
    from just-deleted files), and a crash mid-swap leaves every bucket
    either old or new, never a hole (per-bucket atomicity; buckets are
    independent key sets, so a partial swap is still a consistent table).
    Two commit protocols (``commit``):

    * ``"rename"`` (default) — per-bucket directory swap by rename.
      Correct where rename is atomic: local FS, HDFS.
    * ``"manifest"`` — object-store-safe: directories are IMMUTABLE.
      Each batch writes its merged buckets into a fresh
      ``gen-<swap>/`` directory, then commits by writing ONE new
      manifest object ``_manifest-<n>-<swap>.json`` mapping every
      bucket to the generation dir that currently owns it.  Readers
      resolve through the highest-numbered manifest, so a crash at ANY
      point before the manifest write leaves the table exactly at the
      previous manifest (orphan generation dirs are swept on the next
      batch).  Nothing is ever renamed or overwritten — the manifest
      write is a single-object PUT, which S3-class stores make atomic
      (readers see the old object or the new one, never a torn one).
      This is the same last-writer-manifest idea Delta/Iceberg
      industrialize; use those when available — this seam is the
      minimal self-contained version.

    Ties on ``ts_col`` within a key are broken by
    ``tiebreak_cols`` (ascending); pass a column that is unique per
    event (an id) whenever same-timestamp rows are possible — without
    it the winner among tied rows is whichever the shuffle delivers
    first.
    """
    import json
    import os
    import re
    import shutil

    from pyspark.sql import Window

    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")

    kb = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets))

    def merge_latest(unioned: DataFrame) -> DataFrame:
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc(ts_col), *[F.asc(c) for c in (tiebreak_cols or [])]
        )
        return (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # ---- manifest protocol: immutable generation dirs + last-writer
    # manifest object (see docstring) -------------------------------------
    manifest_re = re.compile(r"^_manifest-(\d{9})-[0-9a-f]{8}\.json$")

    def scan_manifests() -> tuple[int, str | None, dict[str, str], set[str], int]:
        """(highest manifest NUMBER seen, name of the newest PARSABLE
        manifest or None, its mapping, generation dirs referenced by ANY
        parsable manifest, count of manifest files).  The local commit
        below is fsync+hard-link so a torn final manifest cannot happen
        here, but a less careful writer (or a store without atomic
        publish) could still leave one: fall back to the next-lower
        manifest for the mapping rather than bricking the table on
        JSONDecodeError.  The torn file's number still counts toward the
        return value so the next commit numbers ABOVE it (its exclusive
        create would otherwise collide) and the post-commit GC then
        sweeps it.  Names must match the strict pattern the writer
        produces — a stray `_manifest-backup.json` is neither a commit
        point nor ours to delete, so it is skipped entirely instead of
        crashing the int parse and bricking every subsequent batch."""
        entries: list[tuple[int, str]] = []
        if os.path.isdir(path):
            for entry in os.listdir(path):
                m = manifest_re.match(entry)
                if m:
                    entries.append((int(m.group(1)), entry))
        entries.sort(reverse=True)
        newest_name: str | None = None
        newest_map: dict[str, str] = {}
        referenced: set[str] = set()
        for _n, name in entries:
            try:
                with open(os.path.join(path, name)) as f:
                    mp = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            if newest_name is None:
                newest_name, newest_map = name, mp
            referenced.update(mp.values())
        highest = entries[0][0] if entries else 0
        return highest, newest_name, newest_map, referenced, len(entries)

    def _refuse_unparsable(n_files: int) -> None:
        raise RuntimeError(
            f"upsert_latest_per_key: {n_files} manifest file(s) at "
            f"{path!r} but none parsable — refusing to treat the table "
            f"as empty (the orphan sweep would delete every generation "
            f"dir and silently destroy state); restore a manifest or "
            f"clear the directory to reset the table"
        )

    def apply_batch_manifest(batch: DataFrame, _bid: int) -> None:
        s = batch.sparkSession
        b = batch.withColumn("_kb", kb)
        buckets = sorted(r["_kb"] for r in b.select("_kb").distinct().collect())
        if not buckets:
            return
        os.makedirs(path, exist_ok=True)
        mn, cur_name, mapping, referenced, n_files = scan_manifests()
        if n_files and cur_name is None:
            # manifests exist but NONE parse: "empty mapping" here is not
            # "empty table" — sweeping would delete every generation dir.
            # Fail loudly instead (keep-last-2 GC below makes this state
            # require two independent torn writes, but a single-manifest
            # table or an external mangler can still reach it).
            _refuse_unparsable(n_files)
        # orphan sweep: a generation dir not referenced by ANY parsable
        # manifest is a crashed batch's leftover (the manifest write IS
        # the commit point) — reclaim it before writing our own.  The
        # union (not just the newest mapping) keeps the retained previous
        # manifest readable as a fallback: its exclusive gens survive.
        for entry in os.listdir(path):
            if entry.startswith("gen-") and entry not in referenced:
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
        cur_dirs = [
            os.path.join(path, mapping[str(bk)], f"_kb={bk}")
            for bk in buckets
            if str(bk) in mapping
        ]
        if cur_dirs:
            # leaf-dir reads carry no partition column; _kb is a pure
            # function of the keys, so recompute instead of re-reading it
            current = s.read.parquet(*cur_dirs).withColumn("_kb", kb)
            unioned = current.unionByName(b)
        else:
            unioned = b
        merged = merge_latest(unioned)
        swap = uuid.uuid4().hex[:8]
        gen = f"gen-{swap}"
        merged.write.mode("overwrite").partitionBy("_kb").parquet(
            os.path.join(path, gen)
        )
        new_map = dict(mapping)
        for bk in buckets:
            if os.path.exists(os.path.join(path, gen, f"_kb={bk}")):
                new_map[str(bk)] = gen
        # THE commit: one new object, never an overwrite.  Locally that
        # is fsync'd-temp + hard-link — the link is atomic AND exclusive
        # (fails if the name exists), so readers can never observe a
        # torn manifest, only the whole object or nothing.  On an object
        # store the equivalent is a single PUT (atomic by store
        # contract).  Crash before the link → table still reads as
        # manifest mn; the gen dir and the dot-prefixed tmp are swept as
        # orphans by the next batch's GC.
        name = f"_manifest-{mn + 1:09d}-{swap}.json"
        tmp = os.path.join(path, f"._manifest-tmp-{swap}.json")
        with open(tmp, "w") as f:
            json.dump(new_map, f)
            f.flush()
            os.fsync(f.fileno())
        os.link(tmp, os.path.join(path, name))
        os.remove(tmp)
        # GC behind the commit: keep-last-2 — the new manifest plus the
        # parsable predecessor we merged from (and both generation sets),
        # so one torn/lost newest manifest still falls back to a fully
        # readable previous state instead of an empty mapping whose next
        # orphan sweep would destroy every bucket.  Everything older, and
        # any well-formed-but-torn stray, is swept; non-conforming names
        # are not ours and are left alone.
        keep = {name} | ({cur_name} if cur_name else set())
        alive = set(new_map.values()) | set(mapping.values())
        for entry in os.listdir(path):
            if manifest_re.match(entry) and entry not in keep:
                os.remove(os.path.join(path, entry))
            elif entry.startswith("._manifest-tmp-"):
                # a crashed writer's pre-link temp (ours was removed
                # right after the link above)
                os.remove(os.path.join(path, entry))
            elif entry.startswith("gen-") and entry not in alive:
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)

    def recover_interrupted_swap() -> None:
        # crash-recovery sweep: a swap interrupted between the two renames
        # leaves a dot-prefixed saved dir (invisible to Spark's listing —
        # names starting with '.' are always filtered) and a missing
        # bucket.  Restore the old bucket in that case; clear the leftover
        # when the swap had already completed.  This closes the window
        # where a killed process would silently drop a bucket's state.
        # a crash before/during the swap loop also leaves a full merged
        # copy of the touched buckets at '{path}.tmp-<swap>' (a SIBLING of
        # path) — it is only ever live within a single apply_batch call,
        # so any tmp dir seen here is an orphan; reclaim the disk.
        parent = os.path.dirname(os.path.abspath(path)) or "."
        base = os.path.basename(os.path.abspath(path))
        if os.path.isdir(parent):
            for entry in os.listdir(parent):
                if entry.startswith(f"{base}.tmp-"):
                    shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
        if not os.path.isdir(path):
            return
        for entry in os.listdir(path):
            if not entry.startswith(".old-"):
                continue
            bk_name = entry.split("-", 2)[-1]  # .old-<swap>-<_kb=N>
            dst_dir = os.path.join(path, bk_name)
            src_dir = os.path.join(path, entry)
            if os.path.exists(dst_dir):
                shutil.rmtree(src_dir, ignore_errors=True)
            else:
                os.rename(src_dir, dst_dir)

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        s = batch.sparkSession
        b = batch.withColumn("_kb", kb)
        buckets = sorted(r["_kb"] for r in b.select("_kb").distinct().collect())
        if not buckets:
            return
        recover_interrupted_swap()
        # explicit existence check, NOT a bare except: a transient read
        # failure (corrupt footer, FS hiccup) must FAIL the batch and
        # preserve state — swallowing it as "first batch" would merge the
        # batch against nothing and the swap would replace every touched
        # bucket with batch-only rows.
        if os.path.exists(path) and any(
            e.startswith("_kb=") for e in os.listdir(path)
        ):
            current = s.read.parquet(path).filter(F.col("_kb").isin(buckets))
            unioned = current.unionByName(b)
        else:  # first batch: no table yet
            unioned = b
        merged = merge_latest(unioned)
        swap = uuid.uuid4().hex[:8]
        tmp = f"{path}.tmp-{swap}"
        merged.write.mode("overwrite").partitionBy("_kb").parquet(tmp)
        os.makedirs(path, exist_ok=True)
        for bk in buckets:
            src_dir = os.path.join(tmp, f"_kb={bk}")
            if not os.path.exists(src_dir):
                continue
            dst_dir = os.path.join(path, f"_kb={bk}")
            # the saved-old dir is dot-prefixed so Spark's file listing
            # never discovers it as a partition value (a sibling named
            # '_kb=3.old-…' would be parsed as partition value
            # '3.old-…' and corrupt the _kb column's inferred type);
            # recover_interrupted_swap() restores it if we crash between
            # the two renames.
            old = os.path.join(path, f".old-{swap}-_kb={bk}")
            if os.path.exists(dst_dir):
                os.rename(dst_dir, old)
            os.rename(src_dir, dst_dir)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    sink = apply_batch_manifest if commit == "manifest" else apply_batch
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if commit == "manifest":
        _mn, cur_name, mapping, _ref, n_files = scan_manifests()
        if n_files and cur_name is None:
            _refuse_unparsable(n_files)
        if not mapping:
            return spark.createDataFrame([], schema=stream.schema)
        dirs = [
            os.path.join(path, g, f"_kb={bk}") for bk, g in sorted(mapping.items())
        ]
        return spark.read.parquet(*dirs)
    if not os.path.exists(path):
        # zero data rows: no batch ever wrote the table — the converged
        # state is the empty table with the stream's schema
        return spark.createDataFrame([], schema=stream.schema)
    return spark.read.parquet(path).drop("_kb")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved through the session's
    Hadoop configuration, so the streaming gate's state directory works
    on any Hadoop-visible store (local file://, HDFS, S3A), not only a
    POSIX filesystem mounted on the driver."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def _fs_child_names(spark: SparkSession, base: str) -> list:
    """Names of the immediate children of ``base`` (empty if absent)."""
    fs, jpath = _hadoop_fs(spark, base)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def _fs_touch(spark: SparkSession, path: str) -> None:
    """Create/overwrite a small marker file at ``path`` (parents made)."""
    fs, jpath = _hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(b"committed\n"))
    finally:
        out.close()


def _gen_buckets(
    hashed: DataFrame, num_hashes: int, bands: int, seed: int
) -> DataFrame:
    """Shingle-hash frame -> LSH band buckets (shared by the gate's join
    side and the persisted index generations, so both use identical
    signatures)."""
    from mapreduceproject_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_signatures,
    )

    return lsh_band_buckets(minhash_signatures(hashed, num_hashes, seed),
                            num_hashes, bands)


def _write_generation(
    hashed: DataFrame,
    gen: str,
    buckets_dir: str,
    shingles_dir: str,
    num_hashes: int,
    bands: int,
    seed: int,
) -> None:
    """Append one ingest generation (bucket + shingle tables) to the
    streaming gate's index.  Module-level so the crash-replay pytest can
    inject a failure between the two writes — the window the gate's
    committed-generation filter exists to survive."""
    import os

    _gen_buckets(hashed, num_hashes, bands, seed).write.mode(
        "overwrite"
    ).parquet(os.path.join(buckets_dir, f"ingest={gen}"))
    hashed.write.mode("overwrite").parquet(
        os.path.join(shingles_dir, f"ingest={gen}")
    )


def incremental_minhash_stream(
    new_stream: DataFrame,
    spark: SparkSession,
    state_dir: str,
    checkpoint_dir: str,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Streaming ingest near-dup gate: each micro-batch of NEW documents
    is LSH-checked against a PERSISTED corpus bucket index, then appended
    to that index — the streaming twin of
    :func:`operators.dedup.minhash_lsh_incremental` (reference has no
    streaming; this is the ingest gate a continuously-growing corpus
    runs).

    Output: (new_id, prior_id, jaccard) — every batch document
    near-duplicating (exact word-shingle jaccard >= ``threshold``) a
    document ingested STRICTLY EARLIER: the bootstrap corpus or a
    previous micro-batch.  Same-batch pairs are never emitted (the gate
    dedups an arrival against the existing corpus, matching the batch
    twin's batch x corpus contract; with a single batch the result
    equals the batch twin exactly — pytest pins it).

    State layout (``state_dir``): two partitioned parquet tables,
    ``buckets`` (id, band, sig) and ``shingles`` (id, h), each under an
    ``ingest=<gen>`` partition directory per ingest generation
    ("corpus" for the bootstrap, "b<epoch>" per micro-batch).  Per-batch
    cost: the batch side is signature-computed once (batch-sized), the
    index bucket table is scanned once and hash-joined (the batch side
    broadcasts under AQE), and the verify join touches only candidate
    ids — never corpus x corpus, and the index is never rewritten, only
    appended.  At 100 TB the index tables would additionally be bucketed
    by ``sig``/``id`` so the scan prunes; the append-only generation
    layout is already the object-store-safe shape (no file is ever
    replaced).

    Crash safety / exactly-once: writes are idempotent per epoch — each
    epoch owns its ``ingest=b<epoch>`` (and ``results/batch=<epoch>``)
    directory and OVERWRITES it on replay, so a batch that crashed
    mid-write is fully repaired when the checkpoint replays that epoch
    (pytest kills an epoch mid-flight and re-runs).  The checkpoint is
    the commit log; the partition dirs are the data.  A replayed epoch
    reads ONLY committed generations — ``corpus`` plus ``b<k>`` with
    ``k < epoch_id``, enumerated explicitly — so a crash *during* its own
    ``ingest=b<epoch>`` append can neither make the batch join against
    itself (same-batch/self pairs would violate the strictly-earlier
    contract) nor break the read via a partially written parquet file
    (the partial generation dir is never opened, only overwritten).
    The bootstrap generation commits via a ``_corpus_committed`` marker
    written after both corpus tables land, so a crash mid-bootstrap
    rebuilds the corpus generation on restart instead of trusting a
    half-written one.
    """
    import os

    from mapreduceproject_spark.operators.dedup import (
        shingle_hashes,
        verify_jaccard,
    )
    from mapreduceproject_spark.sources.catalog import spread_for_compute

    buckets_dir = os.path.join(state_dir, "buckets")
    shingles_dir = os.path.join(state_dir, "shingles")
    results_dir = os.path.join(state_dir, "results")
    corpus_marker = os.path.join(state_dir, "_corpus_committed")

    # bootstrap: the existing corpus becomes generation "corpus" (skip if
    # a previous run already COMMITTED it — the stream may be a restart;
    # the marker, not the dir, is the commit record, so a crash between
    # the two table writes re-runs the idempotent overwrite here)
    if not _fs_exists(spark, corpus_marker):
        corpus_hashed = shingle_hashes(
            spread_for_compute(corpus), id_col, text_col, shingle_k
        ).persist()
        _write_generation(
            corpus_hashed, "corpus", buckets_dir, shingles_dir,
            num_hashes, bands, seed,
        )
        corpus_hashed.unpersist()
        _fs_touch(spark, corpus_marker)

    def committed_gen_dirs(base: str, epoch_id: int) -> list:
        """Generation dirs the gate may read for this epoch: the
        bootstrap corpus plus batches that committed strictly earlier.
        The current epoch's own ``b<epoch_id>`` (left behind by a crash
        mid-append, before the checkpoint committed) is excluded — that
        dir may be partial and its contents are NOT part of the
        strictly-earlier index.  A generation NEWER than the epoch (or
        an unparsable ``ingest=`` name) cannot be a crash artifact of a
        correctly paired checkpoint — only ``k == epoch_id`` can exist
        uncommitted — so it means the caller pointed an old state_dir at
        a fresh/foreign checkpoint; reading on would silently ignore the
        batches those generations ingested and then overwrite them, so
        the gate refuses instead.  Listing goes through the Hadoop
        FileSystem API, so state_dir may live on any store Spark can
        read (local, HDFS, S3A), not only the driver's POSIX fs."""
        out = []
        for name in _fs_child_names(spark, base):
            if not name.startswith("ingest="):
                continue
            gen = name[len("ingest="):]
            if gen == "corpus":
                out.append(os.path.join(base, name))
                continue
            k = int(gen[1:]) if gen[:1] == "b" and gen[1:].isdigit() else None
            if k is None or k > epoch_id:
                raise ValueError(
                    f"state_dir/checkpoint pairing violation: found index "
                    f"generation '{name}' under {base} while replaying "
                    f"epoch {epoch_id}; only generations b<k> with "
                    f"k <= epoch can exist under a correctly paired "
                    f"checkpoint. The state_dir was likely reused with a "
                    f"fresh or foreign checkpoint_dir — continuing would "
                    f"silently drop previously ingested batches from the "
                    f"index and overwrite their generations."
                )
            if k < epoch_id:
                out.append(os.path.join(base, name))
        return sorted(out)

    def gate(batch: DataFrame, epoch_id: int) -> None:
        s = batch.sparkSession
        hashed_new = shingle_hashes(batch, id_col, text_col, shingle_k).persist()
        # reading the enumerated dirs (not the root) keeps partition
        # discovery from ever touching an uncommitted generation
        idx_buckets = s.read.parquet(
            *committed_gen_dirs(buckets_dir, epoch_id)
        )
        idx_shingles = s.read.parquet(
            *committed_gen_dirs(shingles_dir, epoch_id)
        )
        new_buckets = _gen_buckets(hashed_new, num_hashes, bands, seed)
        pairs = (
            new_buckets.select(F.col("_id").alias("id_a"), "band", "sig")
            .join(
                idx_buckets.select(F.col("_id").alias("id_b"), "band", "sig"),
                ["band", "sig"],
            )
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = pairs.persist()
        # semi-prune the index shingles to ids that actually appear in a
        # candidate pair BEFORE verify_jaccard's sizes groupBy and hash
        # joins: without it every micro-batch re-aggregates and re-joins
        # the FULL index shingle table (corpus-scaled work per batch —
        # the opposite of what an incremental gate is for; guide §2.3
        # "shuffle fewer bytes").  pairs is batch-bounded, so the two
        # semi-joins broadcast; results are identical because
        # verify_jaccard only ever consumes rows of pair ids.
        pair_ids = (
            pairs.select(F.col("id_a").alias("_id"))
            .unionByName(pairs.select(F.col("id_b").alias("_id")))
            .distinct()
        )
        both = (
            hashed_new.select("_id", "h")
            .unionByName(idx_shingles.select("_id", "h"))
            .join(F.broadcast(pair_ids), "_id", "leftsemi")
        )
        out = verify_jaccard(pairs, both, threshold).select(
            F.col("id_a").alias("new_id"),
            F.col("id_b").alias("prior_id"),
            "jaccard",
        )
        out.write.mode("overwrite").parquet(
            os.path.join(results_dir, f"batch={epoch_id}")
        )
        # append the batch to the index LAST: results for this epoch are
        # derived from index-before-this-batch, and a replayed epoch
        # both ignores (committed_gen_dirs) and overwrites any partial
        # b<epoch_id> a crash here leaves behind
        _write_generation(
            hashed_new, f"b{epoch_id}", buckets_dir, shingles_dir,
            num_hashes, bands, seed,
        )
        hashed_new.unpersist()
        pairs.unpersist()

    q = (
        new_stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not _fs_exists(spark, results_dir):
        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("new_id", LongType()),
                    StructField("prior_id", LongType()),
                    StructField("jaccard", DoubleType()),
                ]
            ),
        )
    return spark.read.parquet(results_dir).drop("batch")
