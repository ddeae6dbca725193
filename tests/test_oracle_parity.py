"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver gate runs the same comparison at sf0.01 — scripts/
check_oracle.py runs that locally)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from us_immigration_data_lake_spark.plans.queries import QUERIES
from us_immigration_data_lake_spark.plans.typecheck import (
    canon_duck_type,
    canon_spark_type,
)

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spec = QUERIES[name]
    df = spec.fn(spark, SF)
    rows = [tuple(r) for r in df.collect()]
    if spec.oracle is None:
        assert len(rows) > 0, f"{name}: rows-only query returned nothing"
        return
    res = duck.sql(spec.oracle)
    drows = res.fetchall()
    assert sorted(df.columns) == sorted(res.columns), f"{name}: column mismatch"
    assert len(rows) == len(drows), f"{name}: rowcount mismatch"
    assert _canon(rows, df.columns) == _canon(drows, res.columns), f"{name}: value mismatch"


# --- declared-type parity (r5 verdict ask #2) ------------------------------
# The driver's value hash is type-sensitive: DuckDB HUGEINT vs Spark BIGINT
# hashed differently for q180 despite identical values, while _norm above
# stringifies and cannot see the drift.  This gate compares the *declared*
# result types of both engines (Spark: lazy schema; DuckDB: planner types —
# neither side executes), canonicalized into families that are
# hash-equivalent under the driver's pandas conversion.

_ORACLED = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.mark.parametrize("name", _ORACLED)
def test_declared_types_match(name, spark, duck):
    spec = QUERIES[name]
    sp = {
        f.name: f.dataType.simpleString()
        for f in spec.fn(spark, SF).schema.fields
    }
    rel = duck.sql(spec.oracle)
    du = dict(zip(rel.columns, (str(t) for t in rel.types)))
    drift = {
        col: (sp[col], du[col])
        for col in sp
        if col in du and canon_spark_type(sp[col]) != canon_duck_type(du[col])
    }
    assert not drift, f"{name}: declared-type family drift {drift}"


def test_type_gate_catches_q180_class_artifact(duck):
    """A deliberately mis-typed oracle column must register as drift.

    Replays the exact r5 failure: DuckDB factorial() → HUGEINT while the
    Spark plan declares BIGINT.  If the families ever collapse into one,
    this suite would go blind to the next q180 — fail here first.
    """
    rel = duck.sql("SELECT factorial(CAST(3 AS INTEGER)) AS f")
    duck_t = canon_duck_type(str(rel.types[0]))
    assert duck_t == "int128"
    assert canon_spark_type("bigint") == "int"
    assert duck_t != canon_spark_type("bigint")
