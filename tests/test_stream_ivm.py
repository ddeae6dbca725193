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
