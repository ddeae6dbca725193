"""Window / ranking / top-k operators (SURVEY.md §2.5 — absent from the
reference, required for the engine's query surface).

Scale notes:
- global ``orderBy().limit(k)`` plans TakeOrderedAndProject: per-
  partition top-k then a single-reduce merge — no global sort. Always
  prefer it over sort-then-limit.
- per-group top-k via row_number needs one shuffle on the partition
  keys; ties must be broken deterministically (append a unique key to
  the ordering) or results are run-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    rank_col: str = "rank",
    method: str = "row_number",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(rank_col, fn().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    return ranked(df, partition_by, order_by, rank_col).filter(F.col(rank_col) <= k)


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*order_by).limit(k)
