"""Planted-case tests for operators/history.py and operators/quantize.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.history import merge_upsert, scd2_history
from us_immigration_data_lake_spark.operators.quantize import (
    int_dot,
    quantize_int8,
    quantized_topk,
)


def test_scd2_collapses_runs_and_reopens(spark):
    # user 1: A,A,B,A -> three versions (A reopens as a NEW version)
    ev = spark.createDataFrame(
        [
            (1, "A", 10, 100),
            (1, "A", 20, 101),
            (1, "B", 30, 102),
            (1, "A", 40, 103),
            (2, "X", 5, 200),
        ],
        ["uid", "state", "ts", "eid"],
    )
    rows = sorted(
        scd2_history(ev, ["uid"], "ts", ["state"], "eid").collect(),
        key=lambda r: (r["uid"], r["valid_from"]),
    )
    got = [(r["uid"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
           for r in rows]
    assert got == [
        (1, "A", 10, 30, False),
        (1, "B", 30, 40, False),
        (1, "A", 40, None, True),
        (2, "X", 5, None, True),
    ]


def test_scd2_same_ts_tiebreak_is_deterministic(spark):
    # two state flips at the SAME timestamp: event_id orders them,
    # so A (eid 1) -> B (eid 2) yields a zero-length A version.
    ev = spark.createDataFrame(
        [(1, "A", 10, 1), (1, "B", 10, 2)], ["uid", "state", "ts", "eid"]
    )
    got = sorted(
        [(r["state"], r["valid_from"], r["valid_to"])
         for r in scd2_history(ev, ["uid"], "ts", ["state"], "eid").collect()]
    )
    assert got == [("A", 10, 10), ("B", 10, None)]


def test_merge_upsert_update_insert_and_precedence(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 5)], ["k", "v", "ver"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 2), (4, "d", 1), (3, "stale", 1)], ["k", "v", "ver"]
    )
    # with precedence on ver: key 3's update is STALE (ver 1 < 5) -> base wins
    got = {
        r["k"]: (r["v"], r["ver"])
        for r in merge_upsert(base, updates, ["k"], precedence=["ver"]).collect()
    }
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 5), 4: ("d", 1)}
    # without precedence: updates always win
    got2 = {
        r["k"]: r["v"] for r in merge_upsert(base, updates, ["k"]).collect()
    }
    assert got2 == {1: "a", 2: "B", 3: "stale", 4: "d"}


def test_merge_upsert_is_single_hash_agg(spark):
    base = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    upd = spark.range(50).select(F.col("id").alias("k"), F.lit(2).alias("v"))
    plan = merge_upsert(base, upd, ["k"])._jdf.queryExecution().executedPlan().toString()
    # max(struct) partial-aggregates map-side (struct buffers plan as
    # SortAggregate, still partial+final), one exchange, no window sort
    assert "partial_max" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_quantize_int8_planted(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])], ["vid", "vec"]
    )
    got = {r["vid"]: (r["scale"], r["qvec"], r["sq_norm"])
           for r in quantize_int8(df, "vid", "vec").collect()}
    # scale = 127/2; q = floor(x*63.5 + 0.5): 64, -127, 32
    assert got[1] == (63.5, [64, -127, 32], 64 * 64 + 127 * 127 + 32 * 32)
    assert got[2] == (0.0, [0, 0, 0], 0)


def test_quantized_topk_exact_and_deterministic(spark):
    q = spark.createDataFrame([(0, [1, 0])], ["vid", "qv"])
    c = spark.createDataFrame(
        [(1, [5, 9]), (2, [7, -1]), (3, [5, 2]), (4, [1, 1])], ["vid", "qv"]
    )
    got = [(r["neighbor_id"], r["score"], r["rn"])
           for r in quantized_topk(q, c, "vid", "qv", k=3)
           .orderBy("rn").collect()]
    # scores: 5, 7, 5, 1 -> top3 = 2(7), then tie 1 vs 3 at 5 -> id asc
    assert got == [(2, 7, 1), (1, 5, 2), (3, 5, 3)]


def test_int_dot_matches_python(spark):
    df = spark.createDataFrame([(list(range(10)), list(range(10, 20)))], ["a", "b"])
    got = df.select(int_dot(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert got == sum(i * j for i, j in zip(range(10), range(10, 20)))
