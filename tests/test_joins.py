"""as_of_join semantics: most recent right row ≤ left ts, per key."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.joins import as_of_join


def test_asof_basic(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 205, "t2"), (2, 150, "t3")],
        ["k", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [(1, 90, 10.0), (1, 200, 11.0), (1, 205, 12.0), (2, 160, 99.0)],
        ["k", "qts", "px"],
    )
    out = as_of_join(
        trades, quotes, keys=["k"], left_ts="ts", right_ts="qts",
        right_vals=["px", "qts"], tiebreak="qts",
    )
    got = {r.trade: (r.px, r.qts) for r in out.collect()}
    assert got["t1"] == (10.0, 90)      # most recent quote ≤ 100
    assert got["t2"] == (12.0, 205)     # tie (equal ts) included
    assert got["t3"] == (None, None)    # no quote ≤ 150 for key 2


def test_asof_multiple_right_same_ts_latest_tiebreak_wins(spark):
    left = spark.createDataFrame([(1, 100, "x")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, 50, 1, "a"), (1, 50, 2, "b")], ["k", "qts", "seq", "v"]
    )
    out = as_of_join(
        left, right, keys=["k"], left_ts="ts", right_ts="qts",
        right_vals=["v"], tiebreak="seq",
    )
    assert out.collect()[0].v == "b"


def test_salted_join_equals_plain_join(spark):
    from us_immigration_data_lake_spark.operators.joins import salted_join

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, on="l_orderkey").count()
    salted = salted_join(li, orders, "l_orderkey", salt=4).count()
    assert salted == plain


def test_salted_join_rejects_right_outer(spark):
    from us_immigration_data_lake_spark.operators.joins import salted_join

    import pytest as _pytest
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    with _pytest.raises(ValueError, match="salted_join supports"):
        salted_join(a, a, "k", how="right")


def test_binned_range_join_matches_nested_loop(spark):
    """Binning must be invisible: same pairs as the broadcast
    nested-loop range_join, on intervals engineered to straddle bin
    boundaries (width 10 vs interval length 7)."""
    from us_immigration_data_lake_spark.operators.joins import (
        binned_range_join,
        range_join,
    )

    points = spark.range(0, 200).select(
        F.col("id").alias("pid"), (F.col("id") * 3 % 97).alias("p")
    )
    intervals = spark.range(0, 50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 2 % 90).alias("lo"),
        (F.col("id") * 2 % 90 + 7).alias("hi"),
    )
    binned = binned_range_join(
        points, intervals, "p", "lo", "hi", bin_width=10
    ).select("pid", "iid")
    naive = range_join(points, intervals, "p", "lo", "hi").select("pid", "iid")
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, naive.collect()))


def test_binned_range_join_is_not_nested_loop(spark):
    """The whole point: the physical plan is an equi join (hash/merge
    on the bin key), never BroadcastNestedLoopJoin."""
    from us_immigration_data_lake_spark.operators.joins import binned_range_join

    points = spark.range(0, 1000).select(F.col("id").alias("p"))
    intervals = spark.range(0, 1000).select(
        F.col("id").alias("lo"), (F.col("id") + 5).alias("hi")
    )
    plan = (
        binned_range_join(points, intervals, "p", "lo", "hi", bin_width=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_binned_range_join_beyond_double_precision(spark):
    """Epoch-nano-scale keys (>= 2^53, where DOUBLE can no longer
    represent every integer) must still bin exactly: points one unit
    inside/outside the interval bounds resolve correctly."""
    from us_immigration_data_lake_spark.operators.joins import binned_range_join

    base = 2**60  # far past double's 2^53 integer limit
    points = spark.createDataFrame(
        [(1, base), (2, base + 1), (3, base + 999), (4, base + 1000), (5, base - 1)],
        ["pid", "p"],
    )
    intervals = spark.createDataFrame(
        [(10, base, base + 1000)], ["iid", "lo", "hi"]
    )
    got = sorted(
        r.pid
        for r in binned_range_join(
            points, intervals, "p", "lo", "hi", bin_width=64
        ).collect()
    )
    assert got == [1, 2, 3]  # hi exclusive drops pid=4; pid=5 below lo


def test_binned_range_join_negative_points(spark):
    """Floor (not truncate-toward-zero) semantics for negative keys:
    -1 with width 10 lands in bin -1, matching the interval [-5, 5)."""
    from us_immigration_data_lake_spark.operators.joins import binned_range_join

    points = spark.createDataFrame(
        [(1, -1), (2, -5), (3, -6), (4, 4), (5, 5)], ["pid", "p"]
    )
    intervals = spark.createDataFrame([(10, -5, 5)], ["iid", "lo", "hi"])
    got = sorted(
        r.pid
        for r in binned_range_join(
            points, intervals, "p", "lo", "hi", bin_width=10
        ).collect()
    )
    assert got == [1, 2, 4]
