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
