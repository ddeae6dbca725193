"""Property tests for the statistical-modeling operators: engine
results vs independent numpy reference computations on adversarial
integer inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from us_immigration_data_lake_spark.operators.regress import (
    group_median2,
    groupwise_ols,
)

SETTINGS = settings(max_examples=5, deadline=None)

_XY = st.lists(
    st.tuples(
        st.integers(min_value=-10_000, max_value=10_000),
        st.integers(min_value=-10_000_000, max_value=10_000_000),
    ),
    min_size=3,
    max_size=120,
)


@SETTINGS
@given(_XY)
def test_ols_matches_numpy_lstsq(spark, pairs):
    xs = np.array([p[0] for p in pairs], dtype=float)
    ys = np.array([p[1] for p in pairs], dtype=float)
    if np.all(xs == xs[0]):
        return  # degenerate: slope undefined (engine returns NULL)
    df = spark.createDataFrame([("g", x, y) for x, y in pairs], ["g", "x", "y"])
    out = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    slope_ref, intercept_ref = np.polyfit(xs, ys, 1)
    # micro-unit rounding: allow 1 ulp-of-rounding slack vs the
    # independent float path (the engine itself is exact-moment based)
    assert abs(out.slope_e6 - round(slope_ref * 1e6)) <= 2
    assert abs(out.intercept_e6 - round(intercept_ref * 1e6)) <= 2


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=-1_000_000, max_value=1_000_000),
        min_size=1,
        max_size=150,
    )
)
def test_group_median2_matches_numpy(spark, values):
    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate(values)], ["g", "v", "k"]
    )
    out = group_median2(df, ["g"], "v", ["k"]).collect()[0]
    # np.median interpolates the even case at .5 — exactly the
    # doubled-units semantics
    assert out.median2 == round(float(np.median(values)) * 2)
