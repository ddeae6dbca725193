"""Streaming HLL distinct-count: multi-batch register folding equals
the single-pass sketch bit-for-bit, and replay cannot corrupt state
(max-merge is idempotent AND the versioned store overwrites)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.sketches import (
    hll_estimate,
    hll_registers,
)
from us_immigration_data_lake_spark.streaming.sinks import (
    hll_distinct_stream,
    read_latest_state,
)


def _write_batches(spark, src_dir):
    # 3 files → 3 micro-batches; values overlap across batches so the
    # fold must count the UNION, not the sum of per-batch distincts
    batches = [
        [("a", v) for v in range(0, 400)],
        [("a", v) for v in range(200, 700)] + [("b", v) for v in range(0, 300)],
        [("a", v) for v in range(650, 900)] + [("b", v) for v in range(100, 500)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ["g", "v"]).coalesce(1).write.parquet(
            f"{src_dir}/f{i}", mode="overwrite"
        )


def _run(spark, src_dir, state_dir, ckpt_dir, name):
    stream = (
        spark.readStream.schema("g string, v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/f*")
    )
    hll_distinct_stream(stream, ["g"], "v", state_dir, ckpt_dir, name=name)


def _all_rows(spark, src_dir):
    return spark.read.schema("g string, v bigint").parquet(f"{src_dir}/f*")


import pytest


@pytest.fixture(scope="module")
def folded_run(spark, tmp_path_factory):
    """One shared 3-batch fold for the single-pass-equality and
    union-not-sum tests (identical input/params — rerunning the stream
    per test bought no independence, only ~17 s; r11 durations)."""
    root = tmp_path_factory.mktemp("hll_shared")
    src, state, ckpt = (
        str(root / "src"), str(root / "state"), str(root / "ckpt")
    )
    _write_batches(spark, src)
    _run(spark, src, state, ckpt, "hll_shared_fold")
    return src, state


def test_folded_state_equals_single_pass_sketch(spark, folded_run):
    src, state = folded_run
    versions = sorted(d for d in os.listdir(state) if d.startswith("v="))
    assert len(versions) == 3
    folded = {
        (r["g"], r["__j"], r["max_rho"])
        for r in read_latest_state(spark, state).collect()
    }
    direct = {
        (r["g"], r["__j"], r["max_rho"])
        for r in hll_registers(_all_rows(spark, src), ["g"], "v").collect()
    }
    assert folded == direct  # bit-exact, not approximately equal


def test_folded_estimate_counts_union_not_sum(spark, folded_run):
    src, state = folded_run
    est = {
        r["g"]: r.est_distinct
        for r in hll_estimate(read_latest_state(spark, state), ["g"]).collect()
    }
    # true distinct: a=900 (0..899), b=500 (0..499); per-batch sums
    # would be a=1150, b=700. m=64 → 3σ ≈ 39%
    assert 550 <= est["a"] <= 1250 and est["a"] < 1150
    assert 305 <= est["b"] <= 695


def test_replay_leaves_state_identical(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    _write_batches(spark, src)
    _run(spark, src, state, ckpt, "hll_first")
    before = {
        (r["g"], r["__j"], r["max_rho"])
        for r in read_latest_state(spark, state).collect()
    }
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt, "hll_replay")
    after = {
        (r["g"], r["__j"], r["max_rho"])
        for r in read_latest_state(spark, state).collect()
    }
    assert after == before


def test_histogram_fold_bit_exact_and_replay_safe(spark, tmp_path):
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_build,
    )
    from us_immigration_data_lake_spark.streaming.sinks import (
        histogram_stream,
    )

    src, state, ckpt = (
        str(tmp_path / "hsrc"), str(tmp_path / "hstate"), str(tmp_path / "hckpt")
    )
    batches = [
        [("g", v) for v in range(0, 300)],
        [("g", v) for v in range(150, 600)],
        [("g", v) for v in range(500, 900)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ["g", "v"]).coalesce(1).write.parquet(
            f"{src}/f{i}", mode="overwrite"
        )

    def run(name):
        stream = (
            spark.readStream.schema("g string, v bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        histogram_stream(
            stream, ["g"], "v", state, ckpt, lo=0, width=100, nbins=16,
            name=name,
        )

    run("hist_first")
    all_rows = spark.read.schema("g string, v bigint").parquet(f"{src}/f*")
    direct = {
        (r["g"], r["bin"]): r["n"]
        for r in histogram_build(all_rows, ["g"], "v", 0, 100, 16).collect()
    }
    folded = {
        (r["g"], r["bin"]): r["n"]
        for r in read_latest_state(spark, state).collect()
    }
    assert folded == direct
    shutil.rmtree(ckpt)
    run("hist_replay")
    again = {
        (r["g"], r["bin"]): r["n"]
        for r in read_latest_state(spark, state).collect()
    }
    assert again == direct
