"""PySpark-native analytics engine with the capability surface of
wentaoy2/MapReduceProject ("MapleJuice": SDFS + maple/juice MapReduce),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns, streaming).

Layout
------
- ``session``     SparkSession factory (AQE on, UTC, tuned shuffle).
- ``sources``     table catalog + SDFS-verb store facade.
- ``operators``   maple/juice MapReduce, dedup, similarity, text, multimodal.
- ``functions``   portable hashing, vector math, text column builders.
- ``plans``       the named query registry + matching DuckDB oracle SQL.
- ``streaming``   Structured Streaming jobs over the events table.

Reference parity is documented per-operator with ``/root/reference``
file:line citations in docstrings (see SURVEY.md §2).
"""

from mapreduceproject_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
