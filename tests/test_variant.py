"""Semi-structured VariantType surface (Spark 4): schema-drifting
JSON without a declared struct schema — the modern alternative to
q13's fixed-schema from_json, exercised over heterogeneous payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def drifting(spark):
    # schema drift: keys appear/disappear, types widen across rows —
    # exactly what breaks a fixed from_json struct
    return spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, '{"k": 8, "tags": ["a", "b"]}'),
            (3, '{"k": "nine", "nested": {"x": 1.5}}'),
            (4, '{"other": true}'),
        ],
        ["id", "j"],
    ).select("id", F.parse_json("j").alias("v"))


def test_variant_get_typed_extraction_with_drift(drifting):
    out = {
        r.id: (r.k_int, r.k_str, r.x)
        for r in drifting.select(
            "id",
            F.try_variant_get("v", "$.k", "int").alias("k_int"),
            F.try_variant_get("v", "$.k", "string").alias("k_str"),
            F.try_variant_get("v", "$.nested.x", "double").alias("x"),
        ).collect()
    }
    assert out[1] == (7, "7", None)
    assert out[2][0] == 8
    assert out[3] == (None, "nine", 1.5)  # int cast fails → null, string works
    assert out[4] == (None, None, None)  # missing path → null, not error


def test_variant_array_paths(drifting):
    out = {
        r.id: r.tag1
        for r in drifting.select(
            "id", F.try_variant_get("v", "$.tags[1]", "string").alias("tag1")
        ).collect()
    }
    assert out[2] == "b"
    assert out[1] is None


def test_schema_of_variant_agg_reports_drift(drifting):
    merged = drifting.select(
        F.schema_of_variant_agg("v").alias("s")
    ).collect()[0].s
    # merged schema must mention both the drifted key and the array
    assert "tags" in merged and "nested" in merged
    # k saw BIGINT and STRING → merged as VARIANT (the drift marker)
    assert "k: VARIANT" in merged


def test_variant_roundtrips_through_parquet(spark, drifting, tmp_path):
    path = str(tmp_path / "var.parquet")
    drifting.write.parquet(path)
    back = spark.read.parquet(path)
    out = {
        r.id: r.k
        for r in back.select(
            "id", F.try_variant_get("v", "$.k", "string").alias("k")
        ).collect()
    }
    assert out == {1: "7", 2: "8", 3: "nine", 4: None}


def test_try_parse_json_tolerates_malformed(spark):
    df = spark.createDataFrame(
        [(1, '{"ok": 1}'), (2, "{not json")], ["id", "j"]
    )
    out = {
        r.id: r.ok
        for r in df.select(
            "id",
            F.try_variant_get(F.try_parse_json("j"), "$.ok", "int").alias("ok"),
        ).collect()
    }
    assert out == {1: 1, 2: None}  # malformed row → null, job survives
