"""Streaming drift monitor (streaming/drift.py, r11 — r9 verdict ask
#7): per-snapshot PSI against a fixed reference census must equal the
batch computation under ANY micro-batch split (the counts sum-fold);
the foreachBatch per-micro-batch shape must emit the same PSI values
when batch boundaries align with snapshots; planted drift must move
the metric."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.regress import (
    bin_counts,
    psi_drift,
    psi_vs_census,
)
from us_immigration_data_lake_spark.streaming.drift import (
    reference_census,
    stream_psi_by_snapshot,
    stream_psi_per_batch,
)

LO, W, B = 0, 10, 8


def _docs(spark, shift_snap=None):
    """Four snapshots x 60 docs with n in [0, 60); snapshot
    ``shift_snap`` (if given) is shifted +30 — a planted drift."""
    rows = []
    for snap in range(4):
        for i in range(60):
            v = i % 60
            if snap == shift_snap:
                v = min(v + 30, 79)
            rows.append((snap * 1000 + i, snap, v))
    return spark.createDataFrame(rows, "doc_id long, snapshot long, n long")


@pytest.fixture(scope="module")
def ref(spark):
    rows = [(10_000 + i, i % 60) for i in range(240)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    return reference_census(df, "n", LO, W, B).cache()


def test_psi_vs_census_matches_psi_drift(spark, ref):
    """The factored form must reproduce psi_drift bit-for-bit on the
    same two populations."""
    a = spark.createDataFrame(
        [(i, "a", (i * 7) % 70) for i in range(100)]
        + [(1000 + i, "b", (i * 3) % 55) for i in range(80)],
        "id long, g string, n long",
    )
    direct = psi_drift(a, "g", "n", "a", "b", LO, W, B).collect()[0]
    factored = psi_vs_census(
        bin_counts(a.filter("g = 'a'"), "n", LO, W, B),
        bin_counts(a.filter("g = 'b'"), "n", LO, W, B),
        B,
    ).collect()[0]
    assert (direct.psi_num, direct.psi_den, direct.n_a, direct.n_b) == (
        factored.psi_num, factored.psi_den, factored.n_a, factored.n_b
    )


def test_stream_fold_equals_batch_under_any_split(spark, ref):
    """Multi-batch-equals-batch: the streamed per-snapshot PSI over a
    4-file source (one file per micro-batch, files NOT aligned with
    snapshots) equals the batch psi_vs_census over the same rows."""
    docs = _docs(spark)
    src = tempfile.mkdtemp(prefix="drift_src_")
    try:
        # partition by doc_id % 3 — deliberately CROSSES snapshots, so
        # every snapshot's counts fold across micro-batches (3 files
        # => 3 batches; repartition first or every shuffle partition
        # writes its own file and the run pays ~100 one-row batches)
        docs.withColumn("__b", F.pmod(F.col("doc_id"), F.lit(3))) \
            .repartition(3, "__b") \
            .write.partitionBy("__b").mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/__b=*")
        )
        streamed = {
            r.snapshot: r for r in stream_psi_by_snapshot(
                stream, ref, "snapshot", "n", LO, W, B,
                sink_name="drift_fold_test",
            ).collect()
        }
        batch = {
            r.snapshot: r for r in psi_vs_census(
                bin_counts(docs, "n", LO, W, B, key_cols=["snapshot"]),
                ref, B, key_cols=["snapshot"],
            ).collect()
        }
        assert set(streamed) == set(batch) == {0, 1, 2, 3}
        for s in batch:
            assert (streamed[s].psi_num, streamed[s].psi_den) == (
                batch[s].psi_num, batch[s].psi_den
            )
            assert streamed[s].psi == batch[s].psi
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_planted_drift_moves_the_metric(spark, ref):
    """A snapshot whose distribution is shifted +30 must score a PSI
    well above the in-distribution snapshots."""
    docs = _docs(spark, shift_snap=2)
    out = {
        r.snapshot: r.psi for r in psi_vs_census(
            bin_counts(docs, "n", LO, W, B, key_cols=["snapshot"]),
            ref, B, key_cols=["snapshot"],
        ).collect()
    }
    clean = [out[s] for s in (0, 1, 3)]
    assert out[2] > 5 * max(clean)
    assert out[2] > 0.5  # the standard "significant shift" PSI bar


def test_per_batch_monitor_matches_per_snapshot(spark, ref):
    """foreachBatch shape: with the source partitioned BY snapshot
    (one file per micro-batch = one snapshot), the per-batch PSI
    values must equal the per-snapshot batch computation — batch
    identity is data-defined here, so the emitted multiset is
    deterministic even though batch_ids depend on file order."""
    docs = _docs(spark, shift_snap=1)
    src = tempfile.mkdtemp(prefix="drift_pb_")
    ckpt = tempfile.mkdtemp(prefix="drift_pb_ckpt_")
    try:
        # one file per snapshot directory => one micro-batch per
        # snapshot under maxFilesPerTrigger=1
        docs.repartition(4, "snapshot").write.partitionBy(
            "snapshot"
        ).mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(docs.drop("snapshot").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/snapshot=*")
        )
        rows = stream_psi_per_batch(
            stream, ref, "n", LO, W, B, ckpt, name="drift_pb_test"
        )
        assert len(rows) == 4
        batch_ref = psi_vs_census(
            bin_counts(docs, "n", LO, W, B, key_cols=["snapshot"]),
            ref, B, key_cols=["snapshot"],
        ).collect()
        # per-batch rows carry no snapshot column (batch identity is
        # positional); compare as multisets of the exact rationals
        assert sorted((r[3], r[4]) for r in rows) == sorted(
            (r.psi_num, r.psi_den) for r in batch_ref
        )
        # exactly one drifted batch, and it is the max
        psis = sorted(r[5] for r in rows)
        assert psis[-1] > 5 * psis[-2]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_mixture_split_invariant_and_vanished_source(spark, tmp_path):
    """q231: the share fold must equal the batch computation under a
    snapshot-CROSSING micro-batch split, and a policy source absent
    from a snapshot must surface as an explicit n=0 row (vanished
    source), not disappear from the report."""
    from us_immigration_data_lake_spark.streaming.drift import (
        stream_mixture_by_snapshot,
    )

    rows = [
        # snapshot 0: a-heavy, NO 'c' at all (vanished source)
        *[(i, 0, "a") for i in range(6)], (6, 0, "b"),
        # snapshot 1: balanced
        (10, 1, "a"), (11, 1, "b"), (12, 1, "c"), (13, 1, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, snapshot long, src string")
    src_dir = str(tmp_path / "mixsrc")
    # split FILES mid-snapshot so micro-batches cross snapshot edges
    df.filter("doc_id < 4").coalesce(1).write.parquet(src_dir, mode="overwrite")
    df.filter("doc_id >= 4").coalesce(1).write.parquet(src_dir, mode="append")
    policy = spark.createDataFrame(
        [("a", 500000), ("b", 250000), ("c", 250000)], ["group", "policy_ppm"]
    )
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = stream_mixture_by_snapshot(
        stream, policy, "snapshot", "src", sink_name="q231_test_mix"
    )
    got = {(r.snapshot, r.src): (r.n, r.share_ppm, r.dev_ppm)
           for r in out.collect()}
    # dense grid: every (snapshot, policy-source) pair reports
    assert set(got) == {(s, g) for s in (0, 1) for g in ("a", "b", "c")}
    assert got[(0, "c")] == (0, 0, -250000)          # vanished source
    assert got[(0, "a")] == (6, round(1e6 * 6 / 7), round(1e6 * 6 / 7) - 500000)
    assert got[(1, "a")] == (1, 250000, -250000)
    assert got[(1, "c")] == (2, 500000, 250000)
