"""Reference-parity analytics (SURVEY §2.4) as registry queries.

These are the reference's own workloads — word count
(/root/reference/src/reduce_exe_word_count.go:10-37), reverse map /
inverted index (src/reverse_map.go:10-43), distributed grep
(README.md:17, code absent in the snapshot), line count — expressed as
single declarative plans.  In the reference each is a maple+juice job over
SDFS text files with a master-mediated shuffle; here Catalyst plans a scan
→ partial agg → exchange → final agg, i.e. map-side combining the
reference never had (its map side only concatenates, src/node.go:933-939).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.textfn import duck_tokens, tokens
from mapreduceproject_spark.plans.registry import query
from mapreduceproject_spark.sources.catalog import load_table

# flagship grep over documents.text.  [^\n] rather than '.': the two
# regex dialects disagree on what '.' excludes (Java excludes \r and the
# U+0085/U+2028/U+2029 line separators; RE2 excludes only \n -- verified
# live: 'scan\rxx join' matches in RE2 but not Java), while [^\n] reads
# identically in both.
GREP_PATTERN = r"scan[^\n]*join"


@query(
    "word_count",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest({duck_tokens('text')}) AS word FROM documents)
    GROUP BY word
    """,
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token occurrence counts over documents.text.

    Reference: mapper emits ``word 1`` per token, juice counts lines per
    key-file (src/reduce_exe_word_count.go:21-34).  Here: explode + count —
    Catalyst's partial_count makes the shuffle O(distinct words), not
    O(tokens); at 100 TB the map-side combine is the difference between a
    working job and a dead one.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "inverted_index",
    oracle=f"""
    SELECT word,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
           COUNT(*) AS doc_count
    FROM (
      SELECT DISTINCT word, doc_id
      FROM (SELECT doc_id, unnest({duck_tokens('text')}) AS word FROM documents)
    )
    GROUP BY word
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word -> sorted distinct doc_id list (reverse map, src/reverse_map.go:29-42).

    The reference's reverse_map swaps (k,v)→(v,k) and juice concatenates;
    the idiomatic index is explode → distinct → collect_list sorted.  The
    list is emitted as a comma-joined string so ordering is pinned for the
    value-hash compare.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(tokens(F.col("text"))).alias("word"), "doc_id"
    ).distinct()
    return pairs.groupBy("word").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ",",
        ).alias("doc_ids"),
        F.count("*").alias("doc_count"),
    )


@query(
    "grep",
    oracle=f"""
    SELECT source, COUNT(*) AS match_count
    FROM documents WHERE regexp_matches(text, '{GREP_PATTERN}')
    GROUP BY source
    """,
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep: regex match count per source file.

    Declared in the reference README (README.md:17) but absent from the
    code snapshot (SURVEY §0).  One line of Spark; the regex is evaluated
    JVM-side inside codegen and the filter is applied at scan time.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(GREP_PATTERN))
        .groupBy("source")
        .agg(F.count("*").alias("match_count"))
    )


@query(
    "line_count",
    oracle="SELECT lang, COUNT(*) AS line_count FROM documents GROUP BY lang",
)
def line_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate word count — the reference reducer literally counts lines
    (src/reduce_exe_word_count.go:21-27)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(F.count("*").alias("line_count"))


@query(
    "maple_juice_word_count",
    oracle=f"""
    SELECT word AS key, CAST(COUNT(*) AS VARCHAR) AS value
    FROM (SELECT unnest({duck_tokens('text')}) AS word FROM documents)
    GROUP BY word
    """,
)
def maple_juice_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the actual maple/juice job API (function path):
    maple(tokenize) → juice_algebraic(count) — the reference's flagship
    pipeline (src/reduce_exe_word_count.go:10-37) driven through our
    MapReduce surface rather than a hand-built plan."""
    from mapreduceproject_spark.operators import mapreduce as mr

    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(F.col("text").alias("value"))
    kv = mr.maple(lines, mr.wordcount_mapper)
    out = mr.juice_algebraic(kv, F.count("*"))
    return out.select("key", F.col("value").cast("string").alias("value"))


@query(
    "kv_swap",
    oracle="""
    SELECT source AS k, lang AS v, COUNT(*) AS cnt
    FROM documents GROUP BY source, lang
    """,
)
def kv_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k,v) -> (v,k) swap-then-group, the reverse_map primitive
    (src/reverse_map.go:29-31: emits fields[i+1] fields[i])."""
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(F.col("lang").alias("k"), F.col("source").alias("v"))
    swapped = kv.select(F.col("v").alias("k"), F.col("k").alias("v"))
    return swapped.groupBy("k", "v").agg(F.count("*").alias("cnt"))
