"""foreachBatch sinks (SURVEY.md §2.9): the escape hatch for targets
Structured Streaming has no native connector for — JDBC upserts,
multi-sink fan-out, MERGE-style dedup — while keeping the source-side
offset tracking and recovery of a checkpointed stream.

The exactly-once recipe: Spark guarantees ``batch_id`` is stable across
replays of the same epoch, so a batch function that writes
DETERMINISTICALLY AND IDEMPOTENTLY per batch_id (overwrite-by-batch,
MERGE on key, transactional insert tagged with batch_id) survives the
write-succeeded-but-commit-lost crash window without duplicating rows.
A plain append in foreachBatch does NOT.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    name: str = "foreach_batch",
) -> None:
    """Run a stream to completion (availableNow) through a foreachBatch
    function. ``batch_fn(batch_df, batch_id)`` must be idempotent per
    batch_id — after a crash between sink write and checkpoint commit,
    the next run replays the same batch with the same id."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def exactly_once_parquet_batches(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    name: str = "parquet_batches",
) -> None:
    """Replay-safe parquet sink via foreachBatch: every micro-batch
    lands in its own ``batch_id=N`` partition under dynamic partition
    overwrite, so a replayed batch overwrites ITSELF instead of
    appending duplicates — exactly-once APPEND semantics end to end
    without a transactional table format. This is not a key-based
    upsert: a business key re-emitted in a later batch lands in both
    partitions; MERGE-on-key needs a transactional format (Delta/
    Iceberg) or a JDBC MERGE in the batch function.

    Scale shape: each batch's write touches only its own partition
    (dynamic overwrite never lists sibling partitions' data), and the
    partition column is the 8-byte batch id — no skew, no shuffle
    beyond the stream's own plan.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(target_dir)
        )

    run_foreach_batch(stream_df, _write, checkpoint_dir, name)
