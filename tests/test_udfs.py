"""The sanctioned Python-UDF surface: scalar pandas UDF, grouped-agg
pandas UDF, and a Python UDTF, each driven through DataFrame AND SQL
registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.functions.udfs import (
    ChunkExploder,
    median_abs_deviation,
    register_udfs,
    slugify,
)


def test_slugify_vectorized(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("  Spark & SQL  ",)], ["s"]
    )
    out = [r.slug for r in df.select(slugify("s").alias("slug")).collect()]
    assert out == ["hello-world", "spark-sql"]


def test_median_abs_deviation_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 9.0), ("b", 5.0)], ["k", "v"]
    )
    out = {
        r.k: r.mad
        for r in df.groupBy("k").agg(median_abs_deviation("v").alias("mad")).collect()
    }
    assert out["a"] == 1.0  # median 2; |1-2|,|2-2|,|9-2| → median 1
    assert out["b"] == 0.0


def test_chunk_exploder_udtf(spark):
    text = " ".join(f"w{i}" for i in range(7))
    rows = ChunkExploder(F.lit(text), F.lit(3)).collect()
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert rows[0].chunk_text == "w0 w1 w2"
    assert rows[2].chunk_text == "w6"


def test_sql_registration(spark):
    register_udfs(spark)
    spark.createDataFrame([("One Two",)], ["t"]).createOrReplaceTempView("u_t")
    slug = spark.sql("SELECT slugify(t) AS s FROM u_t").collect()[0].s
    assert slug == "one-two"
    chunks = spark.sql(
        "SELECT c.* FROM u_t, LATERAL chunk_exploder(t, 1) AS c"
    ).collect()
    assert len(chunks) == 2
