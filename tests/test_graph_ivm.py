"""Quantized PageRank and incremental-aggregate-maintenance edges."""

from __future__ import annotations

from us_immigration_data_lake_spark.operators.graph import pagerank_quantized
from us_immigration_data_lake_spark.operators.incremental import (
    agg_state,
    merge_states,
)


def test_pagerank_symmetric_cycle_uniform(spark):
    # 3-cycle with equal weights: symmetry forces equal ranks, and the
    # stationary uniform vector must be (near-)preserved each step.
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], ["src", "dst", "n"]
    )
    out = {r.node: r.rank for r in pagerank_quantized(edges).collect()}
    assert len(set(out.values())) == 1  # symmetric → identical ranks
    # uniform 1/3 ≈ 333333 micro-rank, minus ≤3 micro-units of
    # cumulative floor-division loss over 3 iterations
    assert 333330 <= out["a"] <= 333334


def test_pagerank_sink_attracts_mass(spark):
    # a,b both point at c; c points back only at a: c must outrank a
    # and b, and b (fed only by teleport + a's split) ranks lowest.
    edges = spark.createDataFrame(
        [("a", "c", 1), ("b", "c", 1), ("c", "a", 1)], ["src", "dst", "n"]
    )
    out = {r.node: r.rank for r in pagerank_quantized(edges).collect()}
    assert out["c"] > out["a"] > out["b"]


def test_pagerank_dangling_node_keeps_teleport_only(spark):
    # d has no outgoing edges and nothing points at it → pure teleport.
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1), ("a", "d", 0)], ["src", "dst", "n"]
    )
    # zero-weight edge introduces d as a node but contributes no mass
    out = {r.node: r.rank for r in pagerank_quantized(edges).collect()}
    teleport = (150 * 1_000_000) // (1000 * 3)
    assert out["d"] == teleport


def test_pagerank_weighted_edges_split_proportionally(spark):
    # a sends 3/4 of its mass to b, 1/4 to c → b > c after one pass
    # and the gap persists through the fixed iterations.
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        ["src", "dst", "n"],
    )
    out = {r.node: r.rank for r in pagerank_quantized(edges).collect()}
    assert out["b"] > out["c"]


def test_ivm_merge_equals_full_recompute(spark):
    rows = [(k % 5, v) for k, v in enumerate(range(100))]
    df = spark.createDataFrame(rows, ["k", "v"])
    base = agg_state(df.filter("v < 60"), ["k"], {"sv": "v"})
    delta = agg_state(df.filter("v >= 60"), ["k"], {"sv": "v"})
    merged = {
        r.k: (r.n, r.sv) for r in merge_states(base, delta, ["k"]).collect()
    }
    full = {
        r.k: (r.n, r.sv) for r in agg_state(df, ["k"], {"sv": "v"}).collect()
    }
    assert merged == full


def test_ivm_merge_keys_only_in_one_side_survive(spark):
    base = agg_state(
        spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]), ["k"], {"sv": "v"}
    )
    delta = agg_state(
        spark.createDataFrame([(2, 5), (3, 30)], ["k", "v"]), ["k"], {"sv": "v"}
    )
    out = {r.k: (r.n, r.sv) for r in merge_states(base, delta, ["k"]).collect()}
    assert out == {1: (1, 10), 2: (2, 25), 3: (1, 30)}


def test_ivm_merge_random_split_property(spark):
    # any split point must merge to the full recompute (hypothesis-lite:
    # several random cuts over one dataset in a single session)
    import random

    rnd = random.Random(17)
    rows = [(rnd.randrange(12), rnd.randrange(1000)) for _ in range(400)]
    df = spark.createDataFrame(rows, ["k", "v"]).cache()
    full = {
        r.k: (r.n, r.sv) for r in agg_state(df, ["k"], {"sv": "v"}).collect()
    }
    for cut in (0, 1, 137, 399, 400):
        base = agg_state(
            spark.createDataFrame(rows[:cut] or [(0, 0)], ["k", "v"]).limit(
                cut
            ),
            ["k"], {"sv": "v"},
        )
        delta = agg_state(
            spark.createDataFrame(rows[cut:] or [(0, 0)], ["k", "v"]).limit(
                len(rows) - cut
            ),
            ["k"], {"sv": "v"},
        )
        merged = {
            r.k: (r.n, r.sv)
            for r in merge_states(base, delta, ["k"]).collect()
        }
        assert merged == full, cut
    df.unpersist()
