"""SQL-UDF surface: declared functions must agree with their DataFrame
twins (same expressions, so bit-identical), and stay JVM-side."""

from __future__ import annotations

import pytest

from mapreduceproject_spark.functions.hashing import hash60
from mapreduceproject_spark.functions.register import register_sql_functions
from mapreduceproject_spark.functions.textfn import tokens
from mapreduceproject_spark.functions.vectors import quantized_cosine
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sql_functions(spark)


def test_hash60_sql_matches_column(spark):
    df = spark.createDataFrame([("hello world",), ("spark",)], ["s"])
    df.createOrReplaceTempView("t_sqlfn")
    via_sql = {r["h"] for r in spark.sql("SELECT hash60(s) AS h FROM t_sqlfn").collect()}
    via_col = {r["h"] for r in df.select(hash60(F.col("s")).alias("h")).collect()}
    assert via_sql == via_col


def test_tokens_sql_matches_column(spark):
    df = spark.createDataFrame([("  a  b   c ",), ("one",)], ["s"])
    df.createOrReplaceTempView("t_sqlfn2")
    via_sql = [r["t"] for r in spark.sql("SELECT ws_tokens(s) AS t FROM t_sqlfn2 ORDER BY s").collect()]
    via_col = [r["t"] for r in df.select("s", tokens(F.col("s")).alias("t")).orderBy("s").collect()]
    assert via_sql == via_col


def test_qcosine_sql_matches_column(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]), ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    df.createOrReplaceTempView("t_sqlfn3")
    via_sql = [r["c"] for r in spark.sql("SELECT qcosine(a, b) AS c FROM t_sqlfn3").collect()]
    via_col = [
        r["c"] for r in df.select(quantized_cosine(F.col("a"), F.col("b")).alias("c")).collect()
    ]
    assert via_sql == via_col
    assert via_sql[0] == pytest.approx(1.0)
    assert via_sql[1] == pytest.approx(0.0)


def test_sql_functions_stay_jvm_side(spark):
    df = spark.createDataFrame([("x y",)], ["s"])
    df.createOrReplaceTempView("t_sqlfn4")
    plan = (
        spark.sql("SELECT hash60(s) AS h, ws_tokens(s) AS t FROM t_sqlfn4")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
