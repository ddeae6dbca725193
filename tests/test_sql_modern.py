"""Modern SQL-surface items: parameterized queries (injection-safe
binding), the IDENTIFIER clause for dynamic object names, and the
_metadata hidden columns for file-level lineage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_named_parameter_binding(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "s"])
    df.createOrReplaceTempView("pq_t")
    out = spark.sql(
        "SELECT id FROM pq_t WHERE id > :lo AND s != :bad ORDER BY id",
        args={"lo": 1, "bad": "c"},
    ).collect()
    assert [r.id for r in out] == [2]


def test_positional_parameter_binding(spark):
    df = spark.createDataFrame([(10,), (20,), (30,)], ["v"])
    df.createOrReplaceTempView("pq_u")
    out = spark.sql("SELECT sum(v) AS s FROM pq_u WHERE v >= ?", args=[20])
    assert out.collect()[0].s == 50


def test_parameters_are_values_not_splice(spark):
    # the injection probe: a quote-laden string binds as a VALUE;
    # string-splicing it into the SQL text would change the query
    spark.createDataFrame([("x'; DROP --",), ("ok",)], ["s"]).\
        createOrReplaceTempView("pq_v")
    out = spark.sql(
        "SELECT count(*) AS n FROM pq_v WHERE s = :probe",
        args={"probe": "x'; DROP --"},
    )
    assert out.collect()[0].n == 1


def test_identifier_clause_for_dynamic_names(spark):
    spark.createDataFrame([(5,)], ["v"]).createOrReplaceTempView("dyn_tbl")
    out = spark.sql(
        "SELECT v FROM IDENTIFIER(:t)", args={"t": "dyn_tbl"}
    ).collect()
    assert out[0].v == 5
    # a malicious "table name" stays a name lookup, never SQL text
    with pytest.raises(Exception):
        spark.sql(
            "SELECT v FROM IDENTIFIER(:t)",
            args={"t": "dyn_tbl WHERE 1=1; DROP"},
        ).collect()


def test_metadata_hidden_columns_for_lineage(spark, tmp_path):
    path = str(tmp_path / "lineage")
    spark.createDataFrame([(i,) for i in range(10)], ["v"]).repartition(
        2
    ).write.parquet(path)
    got = spark.read.parquet(path).select(
        "v",
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.file_size").alias("fs"),
        F.col("_metadata.row_index").alias("ri"),
    )
    rows = got.collect()
    assert len(rows) == 10
    assert all(r.fp.endswith(".parquet") and r.fs > 0 for r in rows)
    # two files → two distinct lineage paths, per-file row indexes from 0
    assert len({r.fp for r in rows}) == 2
    assert min(r.ri for r in rows) == 0
