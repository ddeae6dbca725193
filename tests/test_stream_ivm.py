"""Streaming incremental view maintenance: multi-batch folding and
replay idempotency of the versioned state store."""

from __future__ import annotations

import os
import shutil

from us_immigration_data_lake_spark.streaming.sinks import (
    incremental_agg_stream,
    read_latest_state,
)


def _write_batches(spark, src_dir):
    # three source files → three micro-batches with maxFilesPerTrigger=1
    for i, rows in enumerate(
        [[(1, 10), (2, 20)], [(1, 5), (3, 30)], [(2, 1), (3, 1), (1, 1)]]
    ):
        spark.createDataFrame(rows, ["k", "v"]).coalesce(1).write.parquet(
            f"{src_dir}/f{i}", mode="overwrite"
        )


def _run(spark, src_dir, state_dir, ckpt_dir, name):
    stream = (
        spark.readStream.schema("k bigint, v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/f*")
    )
    incremental_agg_stream(
        stream, ["k"], {"sv": "v"}, state_dir, ckpt_dir, name=name
    )


def test_multi_batch_fold_matches_full_recompute(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    _write_batches(spark, src)
    _run(spark, src, state, ckpt, "ivm_fold")
    # one state version per micro-batch
    versions = sorted(d for d in os.listdir(state) if d.startswith("v="))
    assert len(versions) == 3
    out = {r.k: (r.n, r.sv) for r in read_latest_state(spark, state).collect()}
    assert out == {1: (3, 16), 2: (2, 21), 3: (2, 31)}


def test_replay_overwrites_instead_of_double_counting(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    _write_batches(spark, src)
    _run(spark, src, state, ckpt, "ivm_first")
    before = {r.k: (r.n, r.sv) for r in read_latest_state(spark, state).collect()}
    # wipe the checkpoint: every batch replays with the same ids against
    # the EXISTING state dir — versions must overwrite themselves, so
    # the fold result is unchanged (no double counting).
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt, "ivm_replay")
    after = {r.k: (r.n, r.sv) for r in read_latest_state(spark, state).collect()}
    assert after == before


def test_orphan_state_version_is_ignored_and_overwritten(spark, tmp_path):
    # The true crash window: v=N was written but the checkpoint commit
    # for batch N was lost. On replay, batch N must fold from v=N-1
    # (largest version STRICTLY below N) — reading "latest" would
    # double-count the orphan. Simulate by planting a corrupt-value
    # orphan v=0 before the first run: batch 0 must overwrite it.
    src, state, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    _write_batches(spark, src)
    # orphan v=0 with absurd values that would poison any fold using it
    spark.createDataFrame([(1, 999, 999_999)], ["k", "n", "sv"]).write.parquet(
        f"{state}/v=0"
    )
    _run(spark, src, state, ckpt, "ivm_orphan")
    out = {r.k: (r.n, r.sv) for r in read_latest_state(spark, state).collect()}
    # identical to the clean-run result: the orphan never leaked in
    assert out == {1: (3, 16), 2: (2, 21), 3: (2, 31)}
