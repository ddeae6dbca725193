"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics windows can't express (running per-key
aggregates, custom eviction). Arrow-batched; state is one row per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType(), True),
    StructField("total_c", LongType(), True),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType(), True),
    StructField("n_events", LongType(), True),
    StructField("total_value_c", LongType(), True),
    StructField("avg_value_c", DoubleType(), True),
])


def _update(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total_c = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        # integer-ize per row (deterministic), sum exactly
        total_c += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, total_c))
    yield pd.DataFrame(
        [(user_id, n, total_c, float(total_c) / n if n else None)],
        columns=["user_id", "n_events", "total_value_c", "avg_value_c"],
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Running per-user event count / value sum, emitted every batch
    (no watermark dependency — works under availableNow)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
