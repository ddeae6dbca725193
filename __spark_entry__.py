"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``us_immigration_data_lake_spark``; this file
only adapts the registry to the driver's call signatures.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from us_immigration_data_lake_spark.plans.queries import QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


# The driver's correctness gate records at most 50 rows per round, so
# with 93+ registered queries the registration ORDER decides which get
# a driver-verified row. Instead of a hardcoded heuristic (which in r3
# starved the two newest queries past the cap), priority is derived
# from the CORRECTNESS_r*.json files the driver itself wrote, plus the
# PLAN_HASHES.json snapshot (scripts/plan_hashes.py):
#   1. red (err or any explicit False) in their LATEST recorded round
#      — a recorded failure outranks everything: it must re-gate,
#   2. green but the query's OPTIMIZED PLAN changed since its last
#      driver gate (r10 verdict ask #4: the two-phase cap rework
#      changed eight already-green queries' executed plans and the
#      age-only rotation left all eight sampling stale evidence),
#   3. never gated in any recorded round (new queries, registry order),
#   4. green, least-recently-verified round first (rotation: stale r1
#      evidence gets re-checked before last round's fresh greens).
# Ties within a tier keep registry (definition) order. When red +
# never-gated together exceed the 50-row cap, the overflow is the
# NEWEST registrations — each is locally oracle-verified at three
# scales on landing and picks up its driver row next round.
def _gate_history() -> dict[str, tuple[int, bool, bool]]:
    """name -> (latest round seen, was green, was rows-only)."""
    hist: dict[str, tuple[int, bool, bool]] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Rows-only queries (no oracle_sql entry) record
            # err="no_oracle" with the observed row count; a non-null
            # spark_rows means the weak check ran fine — that is this
            # query's best-possible gate outcome, not a failure.
            ran_rows_only = (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            green = (row.get("err") is None or ran_rows_only) and not any(
                v is False for v in row.values()
            )
            prev = hist.get(name)
            if prev is None or rnd >= prev[0]:
                hist[name] = (rnd, green, ran_rows_only)
    return hist


def _plan_changed_rounds() -> dict[str, int]:
    """name -> round its optimized-plan hash last changed (0 = never
    since tracking began). Missing/corrupt file degrades to {} — the
    ranking then behaves exactly as before the tier existed."""
    try:
        with open(os.path.join(_HERE, "PLAN_HASHES.json")) as f:
            state = json.load(f)
    except (OSError, ValueError):
        return {}
    if not isinstance(state, dict):
        return {}
    return {
        n: row.get("changed_r", 0)
        for n, row in state.items()
        if isinstance(row, dict)
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    names = list(QUERIES)
    hist = _gate_history()
    changed = _plan_changed_rounds()
    pos = {n: i for i, n in enumerate(names)}

    def rank(n: str) -> tuple[int, int, int]:
        if n not in hist:
            return (2, 0, pos[n])  # never gated
        rnd, green, rows_only = hist[n]
        if not green:
            return (0, -rnd, pos[n])  # red, most recent failures first
        if changed.get(n, 0) > rnd:
            # plan changed AFTER the query's latest driver gate: its
            # green evidence describes a plan that no longer runs —
            # re-gate before rotating anything merely old
            return (1, rnd, pos[n])
        if rows_only and QUERIES[n].oracle is not None:
            # every recorded gate was the weak rows-only check but the
            # query NOW has an oracle (r5 upgraded q20/q28): the
            # driver has never hash-checked it — rank with never-gated
            # so the new oracle earns its driver row immediately
            return (2, 0, pos[n])
        return (3, rnd, pos[n])  # green, oldest evidence first

    return {name: QUERIES[name].fn for name in sorted(names, key=rank)}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
