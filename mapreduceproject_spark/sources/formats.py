"""File-format sources and sinks.

The reference supports exactly one format — newline-delimited text in SDFS
(/root/reference/src/node.go:919-931) — so text round-trip is the parity
surface; CSV/JSON/Parquet are the free upgrades Spark's readers add
(SURVEY §2.1 "File formats").  Thin wrappers, but deliberately opinionated
for scale:

- explicit schemas everywhere (schema inference = an extra full scan of
  100 TB, and silently wrong types);
- parquet is the engine's native interchange (columnar, predicate
  pushdown, partition pruning);
- line-oriented writers mirror the reference's ``key SPACE value`` output
  (operators/mapreduce.py:write_kv_text is the KV-specific sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Lines as DataFrame[value: string] — the reference's record model."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other columnar built-in — same pushdown/pruning contract
    as parquet (Spark's OrcFileFormat is predicate-pushdown capable)."""
    return spark.read.orc(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single string column → newline-delimited text files."""
    df.write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Partitioned parquet is the scale-out sink: ``partition_by`` columns
    become directory partitions the next reader prunes on.

    ``compression`` picks the codec per dataset (``snappy`` default,
    ``zstd`` for cold data — ~30-50% smaller at similar scan speed,
    ``gzip`` for interchange); at 100 TB the codec choice is a
    double-digit storage/IO difference, so it's a per-sink knob here,
    not a session global."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.orc(path)


def compact_parquet(
    spark: SparkSession, src: str, dest: str, target_mb: int = 128
) -> int:
    """Small-files compaction: rewrite ``src`` into ``dest`` with file
    count sized by total bytes / ``target_mb``.

    The standard maintenance op after streaming/incremental writes leave
    thousands of KB-sized files (each file costs a task + a footer read
    at scan time).  Hive-partitioned layouts (``key=value`` directories,
    e.g. write_training_shards' ``shard=K``) are preserved: the rewrite
    re-partitions BY the discovered partition columns so the directory
    structure — and every reader's partition pruning — survives
    compaction.  Local-fs sizing here; on a real cluster the listing
    comes from the FileSystem API, the rewrite is identical.  Returns the
    output file count (per partition directory for partitioned layouts:
    compaction targets file size, not total count).
    """
    import math
    import os

    total = 0
    # Walk DOWN the directory tree level by level collecting key=value
    # partition columns: a nested layout a=1/b=2/part.parquet has TWO
    # partition columns, and detecting only the top level would silently
    # rewrite 'b' as a data column — losing its directory structure and
    # every reader's pruning on it.  The whole FRONTIER is examined per
    # level, not just the first sorted chain: after a partial partition
    # delete the first value dir can be shallower (empty) than its
    # siblings, and a single-chain walk would under-detect the deeper
    # columns and hit the same silent rewrite one level down.  Sibling
    # dirs must agree on the level's column name, and a level mixing
    # partition dirs with data files is not a Hive layout — both raise
    # instead of guessing.
    part_cols: list[str] = []
    frontier = [src]
    while frontier:
        next_frontier: list[str] = []
        cols_here: set[str] = set()
        has_data = False
        for d in frontier:
            for e in sorted(os.listdir(d)):
                p = os.path.join(d, e)
                if "=" in e and os.path.isdir(p):
                    cols_here.add(e.split("=", 1)[0])
                    next_frontier.append(p)
                elif os.path.isfile(p) and not e.startswith(("_", ".")):
                    has_data = True
        if not cols_here:
            break
        if len(cols_here) > 1:
            raise ValueError(
                f"compact_parquet: inconsistent partition layout under "
                f"{src!r} — level {len(part_cols)} mixes column names "
                f"{sorted(cols_here)}"
            )
        if has_data:
            raise ValueError(
                f"compact_parquet: inconsistent partition depth under "
                f"{src!r} — data files sit beside "
                f"{cols_here.pop()}=... partition dirs at level "
                f"{len(part_cols)}"
            )
        col = cols_here.pop()
        if not col or col in part_cols:
            break
        part_cols.append(col)
        frontier = next_frontier
    for root, _dirs, files in os.walk(src):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    w = df.repartition(n, *part_cols) if part_cols else df.repartition(n)
    writer = w.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(dest)
    return n
