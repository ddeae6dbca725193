"""Histogram quantile sketch: hand-computed estimates, the ±1-bin
error bound against exact quantiles, bit-exact merge, and clipping."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.sketches import (
    histogram_build,
    histogram_merge,
    histogram_quantile,
)


def _df(spark, values):
    return spark.createDataFrame([("g", int(v)) for v in values], ["g", "v"])


def test_hand_computed_median(spark):
    # 10 values 0..9, bins of width 2 → bins {0:2,1:2,...}; target for
    # p500 = ceil(10*0.5)=5 → bin 2 (cum_before 4, n 2):
    # est = 0 + 2*2 + ((5-4)*2)//2 = 5
    sk = histogram_build(_df(spark, range(10)), ["g"], "v", 0, 2, 16)
    est = histogram_quantile(sk, ["g"], 500, 0, 2).collect()[0]
    assert est.p500_est == 5


def test_error_bound_one_bin(spark):
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10_000, size=2_000)
    sk = histogram_build(_df(spark, vals), ["g"], "v", 0, 100, 100)
    for qp in (100, 500, 900):
        est = histogram_quantile(sk, ["g"], qp, 0, 100).collect()[0][1]
        exact = int(np.sort(vals)[int(np.ceil(len(vals) * qp / 1000)) - 1])
        assert abs(est - exact) <= 100, (qp, est, exact)


def test_merge_is_bit_exact(spark):
    rng = np.random.RandomState(4)
    vals = rng.randint(0, 5_000, size=1_000)
    a = histogram_build(_df(spark, vals[:400]), ["g"], "v", 0, 50, 100)
    b = histogram_build(_df(spark, vals[400:]), ["g"], "v", 0, 50, 100)
    direct = histogram_build(_df(spark, vals), ["g"], "v", 0, 50, 100)
    merged = histogram_merge(a, b, ["g"])
    d = {(r["bin"]): r["n"] for r in direct.collect()}
    m = {(r["bin"]): r["n"] for r in merged.collect()}
    assert d == m


def test_out_of_domain_clips_to_edge_bins(spark):
    sk = histogram_build(_df(spark, [-100, 5, 999_999]), ["g"], "v", 0, 10, 4)
    bins = {r["bin"]: r["n"] for r in sk.collect()}
    assert bins == {0: 2, 3: 1}  # -100 clips to bin 0, 999999 to bin 3
    # total mass preserved → quantiles still defined
    est = histogram_quantile(sk, ["g"], 990, 0, 10).collect()[0]
    assert est.p990_est is not None


def test_nulls_excluded(spark):
    df = spark.createDataFrame([("g", 1), ("g", None)], ["g", "v"])
    sk = histogram_build(df, ["g"], "v", 0, 10, 4)
    assert sum(r["n"] for r in sk.collect()) == 1


def test_weighted_build_mass_and_negative_guard(spark):
    import pytest

    df = spark.createDataFrame(
        [("g", 5, 3), ("g", 5, 2), ("g", 25, 1)], ["g", "v", "wt"]
    )
    sk = histogram_build(df, ["g"], "v", 0, 10, 4, weight_col="wt")
    bins = {r["bin"]: r["n"] for r in sk.collect()}
    assert bins == {0: 5, 2: 1}
    # weighted median from the sketch: total 6, target 3 → bin 0
    est = histogram_quantile(sk, ["g"], 500, 0, 10).collect()[0]
    assert 0 <= est.p500_est <= 10
    bad = spark.createDataFrame([("g", 5, -1)], ["g", "v", "wt"])
    with pytest.raises(Exception) as exc:
        histogram_build(bad, ["g"], "v", 0, 10, 4, weight_col="wt").collect()
    assert "negative weight" in str(exc.value)


def test_rank_is_inverse_of_quantile(spark):
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_rank,
    )

    vals = list(range(1000))
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    sk = histogram_build(df, ["g"], "v", 0, 100, 10)
    probes = spark.createDataFrame(
        [("g", v) for v in (0, 250, 500, 999)], ["g", "v"]
    )
    got = {
        r.v: r.rank_permille
        for r in histogram_rank(sk, probes, ["g"], "v", 0, 100, 10).collect()
    }
    # uniform data: rank ≈ value permille, exact at bin edges
    assert got[0] == 0
    assert abs(got[250] - 250) <= 100
    assert abs(got[500] - 500) <= 100
    assert got[999] == 999


def test_rank_interior_gap_bin_scores_mass_below(spark):
    # r4 advisor repro: build over {5, 25} (lo=0, width=10, nbins=4)
    # materializes only bins 0 and 2; a probe at 15 lands in the EMPTY
    # bin 1 and must score the mass strictly below it (1 of 2 → 500),
    # not NULL — the densified CDF carries n=0 bins with real
    # cum_before/total.
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_rank,
    )

    df = spark.createDataFrame([("g", 5), ("g", 25)], ["g", "v"])
    sk = histogram_build(df, ["g"], "v", 0, 10, 4)
    probes = spark.createDataFrame(
        [("g", 15), ("g", 35)], ["g", "v"]
    )
    got = {
        r.v: r.rank_permille
        for r in histogram_rank(sk, probes, ["g"], "v", 0, 10, 4).collect()
    }
    assert got[15] == 500  # 1 of 2 values below bin 1
    assert got[35] == 1000  # trailing gap bin: all mass below


def test_rank_null_on_empty_group(spark):
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_rank,
    )

    sk = histogram_build(
        spark.createDataFrame([], "g string, v long"), ["g"], "v", 0, 10, 4
    )
    probes = spark.createDataFrame([("g", 5)], ["g", "v"])
    out = histogram_rank(sk, probes, ["g"], "v", 0, 10, 4).collect()
    assert out[0].rank_permille is None
