"""The driver-parsed bench metric line must fit the driver's
tail-capture window (r11 AND r14 both lost the official bench record
to truncation — BENCH_r{11,14}.json "parsed": null). bench.py now
routes all bulk diagnostics to the DIAGNOSTICS line / bench_diag.json
and hard-fails if the final metric line nears the window; this test
pins that contract against the REAL headliner set (names and count as
registered), with worst-case-width values, so adding headliners or
payload fields that would push the line past the window fails the
suite instead of silently losing the next round's record."""

from __future__ import annotations

import json

import pytest

import bench
from us_immigration_data_lake_spark.plans.queries import QUERIES


def _headliner_names() -> list[str]:
    return [n for n, s in QUERIES.items() if s.bench]


def test_metric_line_fits_driver_window_at_worst_case_widths():
    names = _headliner_names()
    assert len(names) >= 37  # the r14 set; growth is the hazard
    # worst plausible rendered widths: hundreds of seconds, full
    # 3-decimal raw timings, 2-decimal norms > 100
    timings = {n: 999.999 for n in names}
    norms = {n: 999.999 for n in names}
    line = bench._metric_line(timings, norms, sf=0.1, anchor=0.999,
                              anchor_ref_sec=0.126)
    assert len(line) < bench.METRIC_LINE_MAX
    parsed = json.loads(line)
    # the record the driver parses: the contract-required raw queries
    # dict + the two norm scalars, and NEVER the queries_norm dict too
    # (riding both dicts is what overflowed the r14 line)
    assert parsed["metric"] == "headline_queries_total"
    assert set(parsed["queries"]) == set(names)
    assert "total_norm" in parsed and "anchor_ratio" in parsed
    assert "queries_norm" not in parsed


def test_metric_line_hard_fails_instead_of_truncating():
    # an overstuffed payload (e.g. someone re-adds raw timings as
    # extra keys) must raise loudly, not emit a to-be-truncated line
    names = [f"q{i:03d}_some_long_query_name_padding_padding" for i in
             range(120)]
    timings = {n: 1.234 for n in names}
    norms = {n: 1.234 for n in names}
    with pytest.raises(AssertionError, match="tail-capture"):
        bench._metric_line(timings, norms, 0.1, 0.126, 0.126)
