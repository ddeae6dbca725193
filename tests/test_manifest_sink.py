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


def test_vacuum_refuses_to_touch_legacy_table(spark, tmp_path):
    # pre-versioning layout: _MANIFEST.json only, no _MANIFEST-N files.
    # vacuum must remove NOTHING (the review-pass bug deleted every
    # part file of such a table as "unreferenced")
    import json
    import os

    from us_immigration_data_lake_spark.sources.manifest_sink import (
        read_manifest,
        vacuum_manifest,
    )

    out = str(tmp_path / "legacy")
    os.makedirs(out)
    line = b'{"id": 1}\n'
    import zlib

    with open(os.path.join(out, "part-00000-legacy.jsonl"), "wb") as f:
        f.write(line)
    with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
        json.dump(
            {"files": [{"path": "part-00000-legacy.jsonl", "rows": 1,
                        "crc32": zlib.crc32(line) & 0xFFFFFFFF}],
             "total_rows": 1},
            f,
        )
    assert vacuum_manifest(out, keep_last=1) == []
    assert read_manifest(spark, out).count() == 1


def test_orphan_versioned_manifest_not_resurrected(spark, tmp_path):
    # crash window: _MANIFEST-N written, pointer replace lost → the
    # job FAILED. The next commit must fold from the POINTER, not the
    # orphan, and must overwrite the orphan's version slot.
    import json

    from us_immigration_data_lake_spark.sources.manifest_sink import (
        _manifest_name,
        read_manifest,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    out = str(tmp_path / "orphan")
    spark.createDataFrame([(1,)], ["id"]).write.format("manifest_jsonl").option(
        "path", out
    ).mode("append").save()
    # plant an orphan v=1 claiming a poison file from a failed job
    with open(_manifest_name(out, 1), "w") as f:
        json.dump(
            {"version": 1,
             "files": [{"path": "part-99999-failedjob.jsonl", "rows": 999,
                        "crc32": 0}],
             "total_rows": 999},
            f,
        )
    spark.createDataFrame([(2,)], ["id"]).write.format("manifest_jsonl").option(
        "path", out
    ).mode("append").save()
    latest = read_manifest(spark, out)
    assert {r.id for r in latest.collect()} == {1, 2}
    # the overwritten v=1 snapshot is the committed one, poison-free
    v1 = read_manifest(spark, out, version=1)
    assert {r.id for r in v1.collect()} == {1, 2}
