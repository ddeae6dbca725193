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
    """Red queries outrank never-gated, which outrank greens; greens
    rotate oldest-evidence-first. Checked against the committed
    CORRECTNESS_r*.json history the ordering derives from."""
    hist = entry_mod._gate_history()
    names = list(entry_mod.queries())

    reds = [n for n in names if n in hist and not hist[n][1]]
    never = [n for n in names if n not in hist]
    greens = [n for n in names if n in hist and hist[n][1]]
    # layout is exactly reds ++ never-gated ++ greens
    assert names == reds + never + greens
    # committed history: q70 was red in r3, so with any never-gated
    # backlog it must still land inside the driver's 50-row cap
    if "q70_quantize_int8" in reds:
        assert names.index("q70_quantize_int8") < 50
    # green rotation: non-decreasing last-verified round
    rounds = [hist[n][0] for n in greens]
    assert rounds == sorted(rounds)
