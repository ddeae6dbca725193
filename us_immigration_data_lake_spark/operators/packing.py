"""Sequence packing: assign variable-length documents/chunks to
fixed-token-budget training sequences — the step between a tokenized
corpus and a batch-shaped training set.

Greedy first-fit packing is inherently sequential, so the distributed
form packs by CUMULATIVE OFFSET within independent shards: order items
deterministically inside each shard, take the running token total, and
cut a new sequence every ``budget`` tokens. An item may straddle a cut
(its sequence is decided by its start offset) — the standard
approximation; packing density loss vs first-fit is bounded by
max_item/budget. Shards are the scale unit: each shard's window sorts
only its own rows, so there is no global single-partition sort, and
shard count scales with the cluster (use the md5 split bucket or a
date partition as the shard key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    shard_col: str | Column,
) -> DataFrame:
    """Assign each item to (shard, seq_id, offset): running-total
    packing within each shard, ordered by id (deterministic). Exact
    bigint arithmetic end to end.

    Output: all input columns + ``shard``, ``seq_id`` (0-based within
    shard), ``offset`` (token start within its sequence).
    """
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = df.withColumn("shard", shard).withColumn(
        "__cum", F.sum(F.col(size_col).cast("long")).over(w)
    )
    return (
        sized.withColumn(
            "__start", F.col("__cum") - F.col(size_col).cast("long")
        )
        # integer div/mod — exact at any corpus size (double division
        # of a >2^53 running total would silently round)
        .withColumn("seq_id", F.expr(f"__start div {int(budget)}"))
        .withColumn("offset", F.expr(f"__start % {int(budget)}"))
        .drop("__cum", "__start")
    )
