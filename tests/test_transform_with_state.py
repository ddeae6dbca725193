"""transformWithStateInPandas (Spark 4 arbitrary-state API): the
spend-alert operator. The state-server protocol needs protobuf, which
is broken in this container — the operator gates with a clear error
here, and the functional tests run wherever protobuf works."""

from __future__ import annotations

import pytest

from us_immigration_data_lake_spark.streaming.stateful import spend_alerts


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_environment_gate_is_loud(spark, tmp_path):
    if _protobuf_ok():
        pytest.skip("protobuf present: the gate does not apply")
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 1, 300.0)], "event_id long, user_id long, value double"
    ).write.parquet(path)
    stream = spark.readStream.schema(
        "event_id long, user_id long, value double"
    ).parquet(path)
    with pytest.raises(NotImplementedError, match="protobuf"):
        spend_alerts(stream)


@pytest.mark.skipif(not _protobuf_ok(), reason="google.protobuf broken here")
def test_spend_alerts_emit_on_threshold_crossings(spark, tmp_path):
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 1, 300.0), (2, 1, 300.0), (3, 1, 300.0), (4, 1, 300.0),
         (5, 2, 100.0), (6, 2, 100.0)],
        "event_id long, user_id long, value double",
    ).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        "event_id long, user_id long, value double"
    ).parquet(path)
    rows = []
    q = (
        spend_alerts(stream, threshold_cents=50_000)
        .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_user = {r.user_id: r for r in rows}
    assert 2 not in by_user
    assert by_user[1].total_c == 120_000
    assert by_user[1].thresholds_crossed == 2
