"""Custom Python STREAMING data source (Spark 4 DataSource API):
``replay`` — re-emits a parquet file's rows as deterministic
micro-batches with real offset tracking.

Why it exists: the reference ingests static files (etl.py:161,352);
this engine streams them (§2.9). The built-in file stream source can
only batch per FILE — ``replay`` slices one file into row-range
micro-batches, which is the missing piece for (a) testing multi-batch
stateful semantics against single-file fixtures and (b) replaying a
historical extract through a streaming pipeline at a controlled rate
(the backfill-through-the-streaming-path pattern).

Trigger semantics (measured on this Spark): a
``SimpleDataSourceStreamReader`` prefetches ONE micro-batch per
trigger, and ``availableNow`` drains only what is already prefetched
— so one availableNow run == one micro-batch, and a drain loop is
"re-run until a run emits nothing" (offsets continue from the
checkpoint each time; see drain_replay()). A processingTime trigger
streams batches continuously.

Offset model (exactly-once): an offset is ``{"row": n}`` — rows
emitted so far. ``read(start)`` returns rows [start, start+batch)
and the next offset; Spark checkpoints offsets and replays
``readBetweenOffsets(start, end)`` VERBATIM after a crash — both
paths slice the same materialized row list, so a replayed batch is
bit-identical. The driver-side materialization bounds this source to
driver-memory-sized fixtures by design (it is a replay/test source;
the partitioned DataSourceStreamReader API is the scale-out variant).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class ReplayStreamDataSource(DataSource):
    """``spark.readStream.format("replay").option("path", f)
    .option("batchRows", n).load()``"""

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("replay source requires option 'path'")
        return from_arrow_schema(pq.read_schema(path))

    def simpleStreamReader(self, schema) -> "ReplayStreamReader":
        return ReplayStreamReader(self.options)


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self._path = options.get("path")
        self._batch = int(options.get("batchrows", options.get("batchRows", 100)))
        self._rows: list[tuple] | None = None

    def _data(self) -> list[tuple]:
        if self._rows is None:
            import pyarrow.parquet as pq

            table = pq.read_table(self._path)
            cols = [c.to_pylist() for c in table.columns]
            self._rows = list(zip(*cols)) if cols else []
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._data()
        lo = start["row"]
        hi = min(lo + self._batch, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._data()[start["row"] : end["row"]])


def register_replay_stream(spark) -> None:
    spark.dataSource.register(ReplayStreamDataSource)


def drain_replay(build_query) -> int:
    """Run availableNow queries until one emits no data (see trigger
    semantics above). ``build_query`` must return a STARTED streaming
    query whose progress is observable via lastProgress; returns the
    number of non-empty runs."""
    runs = 0
    while True:
        q = build_query()
        q.awaitTermination()
        progress = q.lastProgress
        rows = progress["numInputRows"] if progress else 0
        if not rows:
            return runs
        runs += 1
