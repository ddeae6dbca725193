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


def pack_sequences_nextfit(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    num_shards: int = 32,
) -> DataFrame:
    """NO-STRADDLE packing: greedy NEXT-FIT of whole documents into
    fixed-``capacity`` bins — the complement of ``pack_sequences``
    above (which packs by cumulative offset and lets an item straddle
    a boundary). Use this form when examples must not be split
    (instruction tuning, document-level objectives); use the straddle
    form when a token is a token (plain LM pretraining) and density
    matters more than document integrity.

    Next-fit (not first-fit) deliberately: ONE sequential pass with
    O(1) state, worst case <= 2x optimal bins (classic bound) — the
    only variant whose state is a pure prefix function, which keeps it
    deterministic and oracle-replayable (DuckDB: recursive CTE).

    Scale design (100 TB): packing is inherently sequential — bin
    identity depends on every prior document — so the global problem
    is SHARDED: shard = pmod(md5_long(id), num_shards) (portable),
    each shard packs independently in parallel, pack order = ascending
    id within shard. Cross-shard waste is at most num_shards - 1
    partial bins — negligible. Within a shard the pack runs as one
    Arrow-batched ``applyInPandas`` pass (a linear loop over the
    shard's lengths; per-shard doc count is the sizing contract, the
    holt_linear bounded-series caveat's sibling). This is the engine's
    sanctioned custom-operator slow path: a data-dependent running
    RESET is not expressible with built-in expressions short of an
    O(n^2) array-append fold, and the plan linter's ban is on ROW-WISE
    Python (BatchEvalPython), not Arrow-grouped kernels.

    Returns ``(id_col, shard, bin, offset)``: bin index within the
    shard, starting offset inside the bin (len_col units). A document
    LONGER than capacity closes any open bin and overflows one bin
    solo (offset 0) — never dropped, never split; truncation is the
    caller's policy. NULL/negative lengths raise (lazily, on the
    offending row) — a silent 0 would corrupt every later offset in
    the shard.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")

    import pandas as pd

    from us_immigration_data_lake_spark.functions.hashing import md5_long

    cap = int(capacity)

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("__pid").reset_index(drop=True)
        bins, offs = [], []
        b, fill = 0, 0
        for ln in pdf["__plen"]:
            ln = int(ln)
            if fill > 0 and fill + ln > cap:
                b += 1
                fill = 0
            offs.append(fill)
            bins.append(b)
            fill += ln
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["offset"] = pd.Series(offs, dtype="int64")
        return pdf[["__pid", "shard", "bin", "offset"]]

    ln = F.col(len_col).cast("long")
    base = df.select(
        F.col(id_col).alias("__pid"),
        # lazy inline validation — no extra pre-scan job; the error
        # fires on the offending row during the packing pass itself
        F.when(
            ln.isNull() | (ln < 0),
            F.raise_error(
                F.lit(f"pack_sequences_nextfit: NULL/negative {len_col} value")
            ).cast("long"),
        )
        .otherwise(ln)
        .alias("__plen"),
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(num_shards))
        .alias("shard"),
    )
    return (
        base.groupBy("shard")
        .applyInPandas(_pack, "`__pid` long, shard long, bin long, offset long")
        .withColumnRenamed("__pid", id_col)
    )
