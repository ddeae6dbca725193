"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_gate_ordering_tiers():
    """Red queries outrank never-gated (including queries whose only
    recorded gates were weak rows-only checks but which NOW carry an
    oracle — the driver has never hash-checked those), which outrank
    greens; greens rotate oldest-evidence-first. Checked against the
    committed CORRECTNESS_r*.json history the ordering derives from."""
    from us_immigration_data_lake_spark.plans.queries import QUERIES

    hist = entry_mod._gate_history()
    names = list(entry_mod.queries())

    def tier(n: str) -> int:
        if n not in hist:
            return 1
        rnd, green, rows_only = hist[n]
        if not green:
            return 0
        if rows_only and QUERIES[n].oracle is not None:
            return 1  # oracle upgraded since the last (weak) gate
        return 2

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers)
    # committed history: q70 was red in r3, so with any never-gated
    # backlog it must still land inside the driver's 50-row cap
    if tier("q70_quantize_int8") == 0:
        assert names.index("q70_quantize_int8") < 50
    # r5 upgrade: q20/q28 gained oracles after rounds of rows-only
    # gating — they must re-enter the hash gate ahead of stale greens
    for upgraded in ("q20_minhash_near_dups", "q28_stream_stateful"):
        if upgraded in hist and hist[upgraded][2]:
            assert names.index(upgraded) < 50
    # green rotation: non-decreasing last-verified round
    greens = [n for n in names if tier(n) == 2]
    rounds = [hist[n][0] for n in greens]
    assert rounds == sorted(rounds)
