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
    if spec.result_schema is not None:
        # the declared-DDL hook the type gate trusts instead of
        # executing this (eager) fn — pin it to the real schema here
        from pyspark.sql.types import StructType

        assert StructType.fromDDL(spec.result_schema) == df.schema, (
            f"{name}: result_schema hook drifted from executed schema"
        )
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
    if spec.result_schema is not None:
        # eager fn (its frame only exists after running the pipeline's
        # actions): use the declared DDL hook, which the value-parity
        # sweep pins to the executed schema
        from pyspark.sql.types import StructType

        fields = StructType.fromDDL(spec.result_schema).fields
    else:
        fields = spec.fn(spark, SF).schema.fields
    sp = {f.name: f.dataType.simpleString() for f in fields}
    rel = duck.sql(spec.oracle)
    du = dict(zip(rel.columns, (str(t) for t in rel.types)))
    drift = {
        col: (sp[col], du[col])
        for col in sp
        if col in du and canon_spark_type(sp[col]) != canon_duck_type(du[col])
    }
    assert not drift, f"{name}: declared-type family drift {drift}"


def test_type_canon_nested_map_splits_at_top_level_comma(duck):
    """ADVICE r6: the greedy map(k, v) regex backtracked to the LAST
    comma, so nested value types (map(varchar, map(varchar, bigint)))
    and comma-bearing keys (decimal(4,1)) computed the key family from
    the wrong substring. The bracket-depth splitter must pair these
    correctly — and the two engines' spellings must land in ONE family."""
    assert (
        canon_duck_type("MAP(VARCHAR, MAP(VARCHAR, BIGINT))")
        == canon_spark_type("map<string,map<string,bigint>>")
        == "map<str,map<str,int>>"
    )
    assert (
        canon_duck_type("MAP(DECIMAL(4,1), BIGINT)")
        == canon_spark_type("map<decimal(4,1),bigint>")
        == "map<decimal(4,1),int>"
    )
    # malformed / multi-top-comma spellings fail CLOSED (canonicalize to
    # themselves → guaranteed cross-engine mismatch), never mis-split
    assert canon_duck_type("map(a, b, c)") == "map(a, b, c)"


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
