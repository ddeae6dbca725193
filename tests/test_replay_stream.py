"""Custom Python streaming data source: row-range micro-batches,
checkpointed resume, and composition with the streaming IVM sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.sources.replay_stream import (
    drain_replay,
    register_replay_stream,
)
from us_immigration_data_lake_spark.streaming.sinks import (
    incremental_agg_stream,
    read_latest_state,
)


def _fixture(spark, tmp_path, n=25):
    path = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(i, i % 4, i * 10) for i in range(n)], ["id", "k", "v"]
    ).coalesce(1).write.mode("overwrite").parquet(path)
    import glob

    return glob.glob(f"{path}/part-*.parquet")[0]


def test_replay_source_slices_one_file_into_batches(spark, tmp_path):
    f = _fixture(spark, tmp_path, n=25)
    register_replay_stream(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", f)
        .option("batchRows", 10)
        .load()
    )
    batches = []

    def build():
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: batches.append((bid, df.count()))
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    # one prefetched micro-batch per availableNow run (documented
    # SimpleDataSourceStreamReader semantics) → drain loops 3 times
    assert drain_replay(build) == 3
    # 25 rows at batchRows=10 → micro-batches of 10/10/5
    assert sorted(c for _, c in batches if c) == [5, 10, 10]


def test_replay_source_resumes_from_checkpoint(spark, tmp_path):
    f = _fixture(spark, tmp_path, n=20)
    register_replay_stream(spark)

    def run(out):
        def build():
            stream = (
                spark.readStream.format("replay")
                .option("path", f)
                .option("batchRows", 7)
                .load()
            )
            return (
                stream.writeStream.foreachBatch(
                    lambda df, bid: out.extend(r.id for r in df.collect())
                )
                .option("checkpointLocation", str(tmp_path / "ckpt2"))
                .trigger(availableNow=True)
                .start()
            )

        return drain_replay(build)

    first: list[int] = []
    assert run(first) == 3  # 20 rows at batchRows=7 → 7/7/6
    assert sorted(first) == list(range(20))
    # drained checkpoint: offsets are exhausted — nothing re-emits
    # (no duplicate replay of committed batches)
    second: list[int] = []
    assert run(second) == 0
    assert second == []


def test_replay_source_feeds_streaming_ivm(spark, tmp_path):
    f = _fixture(spark, tmp_path, n=25)
    register_replay_stream(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", f)
        .option("batchRows", 6)
        .load()
        .select("k", F.col("v").cast("long").alias("v"))
    )
    state_dir = str(tmp_path / "state")
    # drain loop: each availableNow pass folds one replay micro-batch
    # into the versioned state
    for _ in range(10):
        incremental_agg_stream(
            stream, ["k"], {"sv": "v"}, state_dir, str(tmp_path / "ckpt3"),
            name="replay_ivm",
        )
    out = {r.k: (r.n, r.sv) for r in read_latest_state(spark, state_dir).collect()}
    expect = {}
    for i in range(25):
        n, sv = expect.get(i % 4, (0, 0))
        expect[i % 4] = (n + 1, sv + i * 10)
    assert out == expect
