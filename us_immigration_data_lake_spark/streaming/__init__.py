from us_immigration_data_lake_spark.streaming.windows import (
    read_event_stream,
    tumbling_agg,
    session_agg,
    run_to_memory,
)
from us_immigration_data_lake_spark.streaming.sinks import (
    exactly_once_parquet_batches,
    run_foreach_batch,
)
from us_immigration_data_lake_spark.streaming.stateful import running_user_stats

__all__ = [
    "read_event_stream",
    "tumbling_agg",
    "session_agg",
    "run_to_memory",
    "running_user_stats",
    "run_foreach_batch",
    "exactly_once_parquet_batches",
]
