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


# The Spark side of the sweep runs CONCURRENTLY (r8 verdict ask #4:
# the serial 205-query sweep pushed the suite past its 20-minute
# budget). Spark's scheduler is thread-safe — each query's build +
# collect is submitted from a pool thread and the driver interleaves
# their jobs; DuckDB replays stay serial inside each test (the shared
# connection is not thread-safe, and the replay is not the bottleneck).
# Per-query pytest granularity is preserved: the pool memoizes either
# the collected payload or the exception, and each parametrized test
# reports its own query's outcome.
#
# The sweep LAUNCHES at collection-finish (conftest's background-sweep
# hook, r12 verdict ask #6) so it overlaps the empty sweep, the plan
# lint AND the front half of the suite instead of blocking at its
# alphabetical slot; `prefetched` joins the future. -k runs / xdist /
# collect-only get no background launch and fall back inline.
_PREFETCH: dict[str, tuple] = {}
_SWEEP_FUTURE = None


def _run_one(spark, name):
    spec = QUERIES[name]
    try:
        df = spec.fn(spark, SF)
        rows = [tuple(r) for r in df.collect()]
        return ("ok", df.schema, list(df.columns), rows)
    except BaseException as e:  # re-raised in the owning test
        return ("err", e)


def _selected_names(nodeids):
    names = [
        n.split("[", 1)[1].rstrip("]")
        for n in nodeids
        if "test_query_matches_oracle[" in n
    ]
    return [n for n in dict.fromkeys(names) if n in QUERIES] or list(QUERIES)


def _sweep(spark, names):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as ex:
        for name, payload in zip(
            names, ex.map(lambda n: _run_one(spark, n), names)
        ):
            _PREFETCH[name] = payload
    return _PREFETCH


def start_background_sweep(spark, nodeids, executor):
    global _SWEEP_FUTURE
    if any("test_query_matches_oracle[" in n for n in nodeids):
        _SWEEP_FUTURE = executor.submit(_sweep, spark, _selected_names(nodeids))


@pytest.fixture(scope="module")
def prefetched(spark, request):
    if _SWEEP_FUTURE is not None:
        return _SWEEP_FUTURE.result(timeout=1800)
    if not _PREFETCH:
        # prefetch only the SELECTED queries (a -k filtered run must
        # not pay the full registry sweep)
        nodeids = [item.nodeid for item in request.session.items]
        _sweep(spark, _selected_names(nodeids))
    return _PREFETCH


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(name, spark, duck, prefetched):
    spec = QUERIES[name]
    payload = prefetched.get(name) or _run_one(spark, name)
    if payload[0] == "err":
        raise payload[1]
    _, schema, columns, rows = payload
    if spec.result_schema is not None:
        # the declared-DDL hook the type gate trusts instead of
        # executing this (eager) fn — pin it to the real schema here
        from pyspark.sql.types import StructType

        assert StructType.fromDDL(spec.result_schema) == schema, (
            f"{name}: result_schema hook drifted from executed schema"
        )
    if spec.oracle is None:
        assert len(rows) > 0, f"{name}: rows-only query returned nothing"
        return
    res = duck.sql(spec.oracle)
    drows = res.fetchall()
    assert sorted(columns) == sorted(res.columns), f"{name}: column mismatch"
    assert len(rows) == len(drows), f"{name}: rowcount mismatch"
    assert _canon(rows, columns) == _canon(drows, res.columns), f"{name}: value mismatch"


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
        # reuse the parity prefetch's EXECUTED schema when the value
        # sweep ran in this session (full-suite order guarantees it) —
        # re-analyzing every fn serially re-paid ~80 s of identical
        # plan builds (r11 durations profile); a -k filtered run of
        # this test alone still falls back to the direct analysis
        pre = _PREFETCH.get(name)
        if pre is not None and pre[0] == "ok":
            fields = pre[1].fields
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
