"""File-level skipping index: pruning soundness (never drops a file
that holds a match), effectiveness on a clustered layout, and the
zero-I/O empty fast path."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.sources.skipping import (
    RangePredicate,
    collect_file_stats,
    prune_files,
    read_pruned,
)


import pytest


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """4 files, each covering a disjoint k-range — what a zorder/
    hilbert (or just sorted) write layout produces. Built ONCE per
    module with its stats frame: the three pruning tests each paid a
    ~20 s rebuild + footer-stats pass for identical inputs (r9
    durations profile)."""
    path = str(tmp_path_factory.mktemp("skip") / "t")
    for lo in (0, 100, 200, 300):
        spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(100)], ["k", "v"]
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/part{lo}")
    glob = f"{path}/part*"
    stats = collect_file_stats(spark, glob, ["k"]).cache()
    stats.count()
    yield glob, stats
    stats.unpersist()


def test_pruning_sound_and_effective(spark, clustered):
    glob, stats = clustered
    assert stats.count() == 4
    preds = [RangePredicate("k", ">=", 150), RangePredicate("k", "<", 250)]
    kept = prune_files(stats, preds)
    assert len(kept) == 2  # only the 100- and 200-files can match
    pruned = read_pruned(spark, stats, preds)
    full = spark.read.parquet(glob).filter((F.col("k") >= 150) & (F.col("k") < 250))
    got = {r.k for r in pruned.filter((F.col("k") >= 150) & (F.col("k") < 250)).collect()}
    want = {r.k for r in full.collect()}
    assert got == want and len(want) == 100


def test_equality_predicate_prunes_to_one_file(spark, clustered):
    _glob, stats = clustered
    kept = prune_files(stats, [RangePredicate("k", "=", 250)])
    assert len(kept) == 1 and "part200" in kept[0]


def test_all_pruned_returns_none(spark, clustered):
    _glob, stats = clustered
    assert read_pruned(spark, stats, [RangePredicate("k", ">", 10_000)]) is None


def test_null_stats_keep_file(spark, tmp_path):
    path = str(tmp_path / "nulls")
    spark.createDataFrame([(None, "x")], "k int, v string").coalesce(
        1
    ).write.parquet(f"{path}/p0")
    spark.createDataFrame([(5, "y")], "k int, v string").coalesce(
        1
    ).write.parquet(f"{path}/p1")
    stats = collect_file_stats(spark, f"{path}/p*", ["k"])
    # the all-null file has no min/max: stats cannot prove absence,
    # so it must be KEPT (soundness over effectiveness)
    kept = prune_files(stats, [RangePredicate("k", ">=", 0)])
    assert len(kept) == 2


def test_incomparable_predicate_value_keeps_file():
    # r4 advisor finding: a predicate value whose type can't order
    # against the column stats (int stats vs str value, or a None
    # value) must fall back to the sound keep-the-file answer, not
    # raise TypeError mid-prune.
    assert RangePredicate("k", ">=", "abc").keeps(1, 10) is True
    assert RangePredicate("k", "=", None).keeps(1, 10) is True
    assert RangePredicate("k", "<", (1, 2)).keeps(1, 10) is True
    # comparable values still decide
    assert RangePredicate("k", ">=", 11).keeps(1, 10) is False


def test_unsorted_layout_prunes_nothing(spark, tmp_path):
    # round-robin layout: every file spans the whole domain → stats
    # keep everything; the test documents WHY clustering exists
    path = str(tmp_path / "rr")
    rows = [(i, f"v{i}") for i in range(400)]
    spark.createDataFrame(rows, ["k", "v"]).repartition(4).write.parquet(
        f"{path}/all"
    )
    stats = collect_file_stats(spark, f"{path}/all", ["k"])
    kept = prune_files(
        stats, [RangePredicate("k", ">=", 150), RangePredicate("k", "<", 250)]
    )
    assert len(kept) == stats.count()  # no skipping without clustering
