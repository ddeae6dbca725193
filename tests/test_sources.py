"""Source/sink robustness: corrupt-row quarantine, compaction, format
dispatch, schema-first reads."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.sources import read_csv, write_parquet
from us_immigration_data_lake_spark.sources.readers import read_csv_with_quarantine
from us_immigration_data_lake_spark.sources.writers import compact_parquet, write_table


def test_quarantine_splits_bad_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\nnot_an_int,y\n3,z\n")
    clean, bad = read_csv_with_quarantine(
        spark, str(p), schema="a INT, b STRING"
    )
    assert sorted(r.a for r in clean.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not_an_int" in bad.collect()[0][0]


def test_compact_parquet_reduces_files(spark, tmp_path):
    df = spark.range(10000).withColumn("v", F.rand(seed=1))
    out = str(tmp_path / "frag")
    df.repartition(40).write.parquet(out)
    n_before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_before >= 40
    compact_parquet(spark, out, target_file_mb=256)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after < n_before
    assert spark.read.parquet(out).count() == 10000


def test_write_table_delta_gated(spark, tmp_path):
    df = spark.range(10)
    with pytest.raises((NotImplementedError, Exception)) as exc:
        write_table(df, str(tmp_path), "t", fmt="delta")
    assert "delta" in str(exc.value).lower()


def test_write_table_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError):
        write_table(spark.range(1), str(tmp_path), "t", fmt="orcx")


def test_write_parquet_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024", "a"), (2, "2025", "b")], ["id", "yr", "v"]
    )
    path = write_parquet(df, str(tmp_path), "t", partition_by=["yr"])
    assert os.path.isdir(os.path.join(path, "yr=2024"))
    back = spark.read.parquet(path)
    assert back.filter(F.col("yr") == "2025").count() == 1


def test_partition_pruning_in_plan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, str(2020 + i % 3), float(i)) for i in range(100)], ["id", "yr", "v"]
    )
    path = write_parquet(df, str(tmp_path), "pp", partition_by=["yr"])
    back = spark.read.parquet(path).filter(F.col("yr") == "2021")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    # the partition filter must reach the scan (read-side pruning), and
    # the pruned scan reads only the matching directory
    assert "PartitionFilters" in plan and "2021" in plan
    assert back.count() == sum(1 for i in range(100) if 2020 + i % 3 == 2021)
