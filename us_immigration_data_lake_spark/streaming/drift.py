"""Streaming drift monitoring against a fixed reference census
(SURVEY.md §2.9, r10 verdict Next #8): the production question is
"does this week's crawl still look like the curated corpus?", asked
continuously — PSI of the incoming stream's value distribution
against the reference's FIXED binned census, per snapshot window and
per micro-batch.

Reference parity anchor: the reference pipeline has no streaming at
all (etl.py is batch-only; README.md:11 names real-time processing as
an aspiration) — this module is part of the mandated streaming
extension, composing the q213 PSI arithmetic (operators/regress.py)
with Structured Streaming.

Two shapes, one arithmetic:

- ``stream_psi_by_snapshot`` — the ORACLE-CHECKED shape (q218). The
  stream folds per-(snapshot, bin) counts through ONE bounded
  streaming aggregation (state = snapshots x n_bins counter cells,
  never row-order); PSI is computed batch-side from the folded
  census after the availableNow run. Because counts sum-fold
  associatively, the result is independent of how the source files
  split into micro-batches — union-of-batches equals one batch by
  construction, which is exactly what makes a DuckDB batch-SQL oracle
  possible. (PSI-inside-the-stream would need two chained streaming
  aggregations — unsupported — or arbitrary per-batch compute; the
  fold-then-finish split is the Spark-idiomatic factoring.)

- ``stream_psi_per_batch`` — the LIVE-MONITOR shape: a foreachBatch
  sink computes one PSI row per micro-batch (against the same fixed
  census) as data arrives — the alerting signal ("this batch
  drifted") rather than the per-window report. Batch boundaries are a
  property of the source, not the data, so this shape is gated by a
  batches-partitioned-by-snapshot test rather than a DuckDB oracle.
  Per-batch work: one bin-count aggregation over the batch + a
  census-sized PSI finish; the collected result is n_bins-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.regress import (
    bin_counts,
    psi_vs_census,
)


def reference_census(
    ref_df: DataFrame,
    value_col: str,
    lo: int,
    width: int,
    n_bins: int,
) -> DataFrame:
    """The fixed reference census a drift monitor compares against:
    sparse (bin, cnt) under the q213 binning contract. Built ONCE per
    curated reference (cache or collect it — it is n_bins-sized);
    every snapshot/micro-batch pays only its own bin counts."""
    return bin_counts(ref_df, value_col, lo, width, n_bins)


def stream_psi_by_snapshot(
    stream: DataFrame,
    ref_census: DataFrame,
    snapshot_col: str,
    value_col: str,
    lo: int,
    width: int,
    n_bins: int,
    sink_name: str,
) -> DataFrame:
    """Per-snapshot PSI of a document stream against a fixed reference
    census. The streaming stage is ONE groupBy((snapshot, bin)).count()
    — bounded state (snapshots x n_bins cells), complete-mode memory
    sink, availableNow; the PSI arithmetic runs batch-side on the
    folded table. Returns (snapshot, n_bins, n_a, n_b, psi_num,
    psi_den, psi) ordered by snapshot."""
    from us_immigration_data_lake_spark.streaming.windows import run_to_memory

    binx = F.least(
        F.lit(int(n_bins) - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(value_col).cast("long") - F.lit(int(lo)))
                / F.lit(int(width))
            ),
        ),
    ).cast("long")
    folded = run_to_memory(
        stream.filter(F.col(value_col).isNotNull())
        .select(F.col(snapshot_col).alias("__snap"), binx.alias("bin"))
        .groupBy("__snap", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
        sink_name,
        mode="complete",
    )
    return (
        psi_vs_census(folded, ref_census, n_bins, key_cols=["__snap"])
        .withColumnRenamed("__snap", snapshot_col)
        .orderBy(snapshot_col)
    )


def stream_psi_per_batch(
    stream: DataFrame,
    ref_census: DataFrame,
    value_col: str,
    lo: int,
    width: int,
    n_bins: int,
    checkpoint_dir: str,
    name: str = "psi_per_batch",
) -> list[tuple]:
    """Live per-micro-batch PSI monitor: every micro-batch yields one
    (batch_id, n_a, n_b, psi_num, psi_den, psi) tuple against the same
    fixed reference census, collected in arrival order. The per-batch
    plan is bin_counts over the batch (map-side combined) +
    psi_vs_census's broadcast-joined finish; the collect is one row.
    The reference census frame should be cached by the caller — it is
    re-read every batch.

    foreachBatch is the sanctioned shape here (computing a metric per
    batch IS per-batch compute); exactly-once semantics follow the
    streaming/sinks.py recipe — the emitted list is keyed by the
    replay-stable batch_id, so a crash-replayed batch overwrites its
    own entry instead of duplicating it."""
    from us_immigration_data_lake_spark.streaming.sinks import run_foreach_batch

    results: dict[int, tuple] = {}

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        counts = bin_counts(batch_df, value_col, lo, width, n_bins)
        row = psi_vs_census(counts, ref_census, n_bins).collect()
        if row:  # an empty micro-batch has no distribution to test
            r = row[0]
            results[batch_id] = (
                batch_id, r.n_a, r.n_b, r.psi_num, r.psi_den, r.psi
            )

    run_foreach_batch(stream, _one_batch, checkpoint_dir, name=name)
    return [results[k] for k in sorted(results)]


def stream_mixture_by_snapshot(
    stream: DataFrame,
    ref_shares: DataFrame,
    snapshot_col: str,
    group_col: str,
    sink_name: str,
) -> DataFrame:
    """Per-snapshot source-MIX monitor: is the incoming stream's
    source composition still the curated corpus's? The streaming stage
    is ONE groupBy((snapshot, group)).count() — bounded state
    (snapshots × sources counter cells, a deployment constant),
    complete-mode memory sink, availableNow; the share arithmetic runs
    batch-side on the folded table, the same fold-then-finish
    factoring (and oracle-ability argument) as stream_psi_by_snapshot.

    ``ref_shares`` carries (group, policy_ppm) — the curated
    reference's own mix, or any target policy (q220 weights). Emits
    one row per (snapshot, group): n, share_ppm = round(1e6·n/N),
    policy_ppm, dev_ppm = share − policy; groups the policy names but
    the snapshot never saw report n=0 via the policy join, so a
    silently VANISHED source is visible, not just a drifted one."""
    from us_immigration_data_lake_spark.streaming.windows import run_to_memory

    folded = run_to_memory(
        stream.select(
            F.col(snapshot_col).alias("__snap"), F.col(group_col)
        )
        .groupBy("__snap", group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n")),
        sink_name,
        mode="complete",
    )
    # ONE aggregation pass per snapshot carrying both the total and a
    # group->count map (sources per snapshot are a deployment constant,
    # so the map row is bounded); densifying against the policy is then
    # a broadcast cross of two tiny frames — no self-join back into the
    # folded subtree (which trips Catalyst's conflicting-reference
    # resolution on the memory-sink table).
    per_snap = folded.groupBy("__snap").agg(
        F.sum("n").cast("long").alias("__N"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col(group_col), F.col("n")))
        ).alias("__m"),
    )
    dense = per_snap.crossJoin(F.broadcast(ref_shares.select(
        F.col("group").alias(group_col), F.col("policy_ppm")
    )))
    n = F.coalesce(
        F.try_element_at("__m", F.col(group_col)), F.lit(0)
    ).cast("long")
    share = F.round(F.lit(1_000_000.0) * n / F.col("__N")).cast("long")
    out = dense.select(
        F.col("__snap").alias(snapshot_col),
        F.col(group_col),
        n.alias("n"),
        share.alias("share_ppm"),
        F.col("policy_ppm").cast("long").alias("policy_ppm"),
        (share - F.col("policy_ppm")).cast("long").alias("dev_ppm"),
    )
    return out.orderBy(snapshot_col, group_col)
