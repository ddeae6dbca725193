"""as_of_join cross-validated against pandas.merge_asof — a fully
independent reference implementation of the same semantics, over
randomized keyed series in both directions with and without
tolerance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from us_immigration_data_lake_spark.operators.joins import as_of_join


def _random_series(rng, n, n_keys, t_max):
    return pd.DataFrame({
        "k": rng.integers(0, n_keys, n),
        "ts": rng.integers(0, t_max, n),
        "rid": np.arange(n),
    })


def _spark_asof(spark, left_pd, right_pd, direction, tolerance):
    left = spark.createDataFrame(
        left_pd.rename(columns={"rid": "lid"})
    )
    right = spark.createDataFrame(
        right_pd.assign(val=right_pd.rid * 10).rename(columns={"rid": "r_rid"})
    )
    out = as_of_join(
        left, right.select("k", "ts", "r_rid", "val"),
        keys=["k"], left_ts="ts", right_ts="ts",
        right_vals=["val"], tiebreak="r_rid",
        direction=direction, tolerance=tolerance,
    )
    return {r.lid: r.val for r in out.collect()}


def _pandas_asof(left_pd, right_pd, direction, tolerance):
    right = right_pd.assign(val=right_pd.rid * 10)
    # merge_asof needs sorted inputs; ties: keep the LAST duplicate ts
    # row for backward / FIRST for forward to match the tiebreak rule
    # (latest rid wins backward, earliest forward)
    right = right.sort_values(["ts", "rid"]).drop_duplicates(
        subset=["k", "ts"],
        keep="last" if direction == "backward" else "first",
    )
    merged = pd.merge_asof(
        left_pd.sort_values(["ts", "rid"]),
        right.sort_values("ts")[["k", "ts", "val"]],
        on="ts",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=True,
    )
    return {
        int(r.rid): (None if pd.isna(r.val) else int(r.val))
        for r in merged.itertuples()
    }


def test_asof_matches_pandas_backward_and_forward(spark):
    # the four (direction, tolerance) configs are independent
    # fixed-machinery-bound collects (~13 s each on tiny inputs);
    # thread them like the registry sweeps — wall = slowest config,
    # not the sum (r13 durations profile: this was the suite's #1
    # single test at 54 s serial)
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(13)
    cases = []
    for direction in ("backward", "forward"):
        for tolerance in (None, 50):
            left_pd = _random_series(rng, 300, 8, 1000)
            right_pd = _random_series(rng, 200, 8, 1000)
            cases.append((direction, tolerance, left_pd, right_pd))

    def run(case):
        direction, tolerance, left_pd, right_pd = case
        got = _spark_asof(spark, left_pd, right_pd, direction, tolerance)
        want = _pandas_asof(left_pd, right_pd, direction, tolerance)
        return direction, tolerance, got, want

    with ThreadPoolExecutor(max_workers=4) as ex:
        for direction, tolerance, got, want in ex.map(run, cases):
            assert got == want, (direction, tolerance)
