"""Round-trip tests for every supported source/sink format, including the
partition-pruning contract of partitioned parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceproject_spark.sources import formats
from mapreduceproject_spark.sources.catalog import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "csv")
    formats.write_csv(docs, path)
    back = formats.read_csv(
        spark, path, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "json")
    formats.write_json(docs, path)
    back = formats.read_json(
        spark, path, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_text_roundtrip(spark, sf_dir, tmp_path):
    lines = _docs(spark, sf_dir).select(
        F.concat_ws(" ", "doc_id", "lang").alias("value")
    )
    path = str(tmp_path / "text")
    formats.write_text(lines, path)
    assert _sorted_rows(formats.read_text(spark, path)) == _sorted_rows(lines)


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "pq")
    formats.write_parquet(docs, path, partition_by=["lang"])
    back = formats.read_parquet(spark, path)
    one = back.filter(F.col("lang") == "en")
    expect = docs.filter(F.col("lang") == "en")
    assert _sorted_rows(one.select("doc_id", "n_chars")) == _sorted_rows(
        expect.select("doc_id", "n_chars")
    )
    # partition pruning visible in the physical plan: the lang filter is a
    # partition filter, not a data filter over every file
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from mapreduceproject_spark.sources.formats import compact_parquet

    docs = _docs(spark, sf_dir)
    fragmented = str(tmp_path / "frag")
    docs.repartition(37).write.parquet(fragmented)
    import glob

    assert len(glob.glob(f"{fragmented}/part-*")) == 37
    dest = str(tmp_path / "compacted")
    n = compact_parquet(spark, fragmented, dest, target_mb=128)
    assert n == 1 and len(glob.glob(f"{dest}/part-*")) == 1
    assert _sorted_rows(spark.read.parquet(dest)) == _sorted_rows(docs)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "orc")
    formats.write_orc(docs, path)
    back = formats.read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(docs)
    # ORC scans take predicate pushdown like parquet
    plan = (
        back.filter(F.col("n_chars") > 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "n_chars" in plan.split("PushedFilters")[1][:200]


def test_parquet_codec_roundtrip(spark, sf_dir, tmp_path):
    """Codec is a per-sink knob (zstd/gzip/snappy all bundled): data must
    round-trip bit-identically under every codec and the files must
    actually carry the codec's extension."""
    import os

    from mapreduceproject_spark.sources.formats import read_parquet, write_parquet

    df = load_table(spark, sf_dir, "nation")
    expect = sorted(map(tuple, df.collect()))
    for codec, ext in [("zstd", ".zstd.parquet"), ("gzip", ".gz.parquet"), ("snappy", ".snappy.parquet")]:
        path = str(tmp_path / codec)
        write_parquet(df, path, compression=codec)
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert files and all(f.endswith(ext) for f in files), (codec, files)
        got = sorted(map(tuple, read_parquet(spark, path).collect()))
        assert got == expect, codec


def test_compact_parquet_preserves_partition_layout(spark, sf_dir, tmp_path):
    """Compacting a hive-partitioned dataset must keep the key=value
    directory layout (and therefore every reader's partition pruning) —
    not silently flatten partition columns into data columns."""
    import glob

    from mapreduceproject_spark.sources.formats import compact_parquet

    docs = _docs(spark, sf_dir)
    src = str(tmp_path / "part_src")
    docs.repartition(11).write.partitionBy("lang").parquet(src)
    dest = str(tmp_path / "part_dest")
    compact_parquet(spark, src, dest, target_mb=128)
    src_dirs = {p.rsplit("/", 1)[-1] for p in glob.glob(f"{src}/lang=*")}
    dest_dirs = {p.rsplit("/", 1)[-1] for p in glob.glob(f"{dest}/lang=*")}
    assert dest_dirs == src_dirs and dest_dirs
    # fewer files after compaction, identical content
    assert len(glob.glob(f"{dest}/lang=*/part-*")) < len(
        glob.glob(f"{src}/lang=*/part-*")
    )
    # partition column reads back last — align column order before comparing
    back = spark.read.parquet(dest).select(*docs.columns)
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_compact_parquet_preserves_nested_partition_layout(spark, tmp_path):
    """A NESTED hive layout (a=…/b=…/) must survive compaction with BOTH
    partition columns: detecting only the top level would silently rewrite
    'b' as a data column, losing its directory structure and pruning."""
    import glob

    from mapreduceproject_spark.sources.formats import compact_parquet

    df = spark.createDataFrame(
        [(i, i % 2, i % 3, f"v{i}") for i in range(60)],
        "id long, a long, b long, payload string",
    )
    src = str(tmp_path / "nested_src")
    df.repartition(7).write.partitionBy("a", "b").parquet(src)
    dest = str(tmp_path / "nested_dest")
    compact_parquet(spark, src, dest, target_mb=128)
    src_dirs = {p.split(src + "/", 1)[1] for p in glob.glob(f"{src}/a=*/b=*")}
    dest_dirs = {p.split(dest + "/", 1)[1] for p in glob.glob(f"{dest}/a=*/b=*")}
    assert dest_dirs == src_dirs and len(dest_dirs) == 6
    back = spark.read.parquet(dest).select(*df.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_compact_parquet_detects_nested_cols_past_emptied_first_chain(
    spark, tmp_path
):
    """After a partial partition delete the FIRST sorted value dir can be
    shallower (emptied) than its siblings; a single-chain walk would then
    under-detect the deeper partition columns and silently rewrite them
    as data columns.  The frontier walk must still find 'b' through the
    surviving sibling."""
    import glob
    import shutil

    from mapreduceproject_spark.sources.formats import compact_parquet

    df = spark.createDataFrame(
        [(i, i % 2, i % 3, f"v{i}") for i in range(60)],
        "id long, a long, b long, payload string",
    )
    src = str(tmp_path / "holey_src")
    df.write.partitionBy("a", "b").parquet(src)
    # partial delete: a=0 loses all its b=... children but the dir remains
    for sub in glob.glob(f"{src}/a=0/b=*"):
        shutil.rmtree(sub)
    dest = str(tmp_path / "holey_dest")
    compact_parquet(spark, src, dest, target_mb=128)
    dest_dirs = {p.split(dest + "/", 1)[1] for p in glob.glob(f"{dest}/a=*/b=*")}
    assert dest_dirs == {f"a=1/b={b}" for b in range(3)}
    back = spark.read.parquet(dest).select(*df.columns)
    expect = df.filter("a = 1")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, expect.collect()))


def test_compact_parquet_rejects_inconsistent_layout(spark, tmp_path):
    """Data files sitting beside key=value partition dirs at the same
    level is not a Hive layout — compaction must refuse loudly instead of
    guessing a partitioning that would drop or misfile rows."""
    import shutil

    import pytest

    from mapreduceproject_spark.sources.formats import compact_parquet

    df = spark.createDataFrame([(i, i % 2) for i in range(10)], "id long, a long")
    src = str(tmp_path / "mixed_src")
    df.write.partitionBy("a").parquet(src)
    flat = str(tmp_path / "flat")
    df.drop("a").write.parquet(flat)
    import glob as _g

    shutil.copy(_g.glob(f"{flat}/part-*.parquet")[0], f"{src}/stray.parquet")
    with pytest.raises(ValueError, match="inconsistent partition depth"):
        compact_parquet(spark, src, str(tmp_path / "mixed_dest"))
