"""Custom Python DataSource writer: two-phase commit protocol —
manifest atomicity, checksum verification, abort invisibility."""

from __future__ import annotations

import json
import os

import pytest

from us_immigration_data_lake_spark.sources.manifest_sink import (
    read_manifest,
    register_manifest_sink,
)


def test_write_commit_and_manifest_readback(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], ["id", "s"]
    ).repartition(3)
    df.write.format("manifest_jsonl").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 20
    assert len(manifest["files"]) == 3
    back = read_manifest(spark, out)
    assert back.count() == 20
    assert {r.id for r in back.collect()} == set(range(20))


def test_orphan_files_invisible_without_manifest_entry(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink2")
    spark.createDataFrame([(1,)], ["id"]).coalesce(1).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("append").save()
    # simulate a crashed speculative task: orphan part file on disk
    with open(os.path.join(out, "part-99999-deadbeef.jsonl"), "w") as f:
        f.write('{"id": 999}\n')
    back = read_manifest(spark, out)
    assert [r.id for r in back.collect()] == [1]  # orphan never read


def test_checksum_corruption_detected_at_read(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink3")
    spark.createDataFrame([(1,), (2,)], ["id"]).coalesce(1).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("append").save()
    part = [p for p in os.listdir(out) if p.startswith("part-")][0]
    with open(os.path.join(out, part), "a") as f:
        f.write('{"id": 666}\n')  # tamper after commit
    with pytest.raises(ValueError, match="checksum"):
        read_manifest(spark, out)


def test_failed_job_leaves_no_manifest(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink4")
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (0,)], ["id"]).select(
        # ANSI division by zero mid-write → task failure → job abort
        (F.lit(10) / F.col("id")).alias("v")
    )
    with pytest.raises(Exception):
        df.write.format("manifest_jsonl").option("path", out).mode(
            "append"
        ).save()
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))


def test_second_append_keeps_first_jobs_rows(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink5")
    for lo in (0, 10):
        spark.createDataFrame(
            [(i,) for i in range(lo, lo + 10)], ["id"]
        ).coalesce(1).write.format("manifest_jsonl").option("path", out).mode(
            "append"
        ).save()
    back = read_manifest(spark, out)
    assert {r.id for r in back.collect()} == set(range(20))


def test_overwrite_mode_replaces_snapshot(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink6")
    spark.createDataFrame([(1,)], ["id"]).coalesce(1).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("append").save()
    spark.createDataFrame([(2,)], ["id"]).coalesce(1).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("overwrite").save()
    back = read_manifest(spark, out)
    assert [r.id for r in back.collect()] == [2]


def test_time_travel_reads_historical_snapshot(spark, tmp_path):
    from us_immigration_data_lake_spark.sources.manifest_sink import (
        manifest_versions,
        read_manifest,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    out = str(tmp_path / "tt")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("append").save()
    spark.createDataFrame([(2, "b")], ["id", "v"]).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("append").save()
    assert manifest_versions(out) == [0, 1]
    v0 = read_manifest(spark, out, version=0)
    latest = read_manifest(spark, out)
    assert v0.count() == 1 and latest.count() == 2
    assert {r.id for r in v0.collect()} == {1}


def test_overwrite_snapshot_keeps_history_readable(spark, tmp_path):
    from us_immigration_data_lake_spark.sources.manifest_sink import (
        read_manifest,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    out = str(tmp_path / "ow")
    spark.createDataFrame([(1,)], ["id"]).write.format("manifest_jsonl").option(
        "path", out
    ).mode("append").save()
    spark.createDataFrame([(9,)], ["id"]).write.format("manifest_jsonl").option(
        "path", out
    ).mode("overwrite").save()
    assert {r.id for r in read_manifest(spark, out).collect()} == {9}
    # pre-overwrite snapshot still time-travels
    assert {r.id for r in read_manifest(spark, out, version=0).collect()} == {1}


def test_vacuum_removes_unreferenced_and_keeps_live(spark, tmp_path):
    import os

    from us_immigration_data_lake_spark.sources.manifest_sink import (
        manifest_versions,
        read_manifest,
        register_manifest_sink,
        vacuum_manifest,
    )

    register_manifest_sink(spark)
    out = str(tmp_path / "vac")
    for ids, mode in [([1], "append"), ([2], "append"), ([9], "overwrite")]:
        spark.createDataFrame([(i,) for i in ids], ["id"]).write.format(
            "manifest_jsonl"
        ).option("path", out).mode(mode).save()
    removed = vacuum_manifest(out, keep_last=1)
    # v0/v1 manifests gone; the v0/v1-only part files gone too
    assert manifest_versions(out) == [2]
    assert any(n.startswith("_MANIFEST-") for n in removed)
    assert any(n.startswith("part-") for n in removed)
    # latest snapshot intact and checksum-verified
    assert {r.id for r in read_manifest(spark, out).collect()} == {9}
    # vacuumed version no longer readable
    try:
        read_manifest(spark, out, version=0)
        raised = False
    except FileNotFoundError:
        raised = True
    assert raised
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))
