"""Partition-aware parquet sink.

Generalizes the reference's writes (SURVEY.md §2.1 S6/S7):
``df.write.mode('overwrite').parquet(path)`` at etl.py:221,273,396 and
the partitioned ARRIVALDATE write at etl.py:336 — which contains a path
bug (``output_data + 's3a://…'`` concatenates two URI roots). Central
path handling here prevents that class of bug.

Scale notes:
- ``partition_by`` columns should be low-cardinality date-ish keys so
  read-side partition pruning works (etl.py:336 partitions by
  year+month — the right instinct; we keep it).
- ``target_file_partitions`` lets callers coalesce/repartition before
  writing so they don't produce millions of tiny files at 100 TB
  (small-files is the top operational failure of naive lake writers).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    base_path: str,
    table: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_file_partitions: int | None = None,
    compression: str = "snappy",
) -> str:
    path = posixpath.join(base_path.rstrip("/"), table)
    out = df
    if target_file_partitions is not None:
        if partition_by:
            # co-locate rows of one output partition into one task/file
            out = out.repartition(target_file_partitions, *partition_by)
        else:
            out = out.repartition(target_file_partitions)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path
