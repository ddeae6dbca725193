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


def resample_fill(
    df: DataFrame,
    key_col: str,
    slot_col: str,
    value_cols: dict[str, str],
    step: int,
    fill: str = "zero",
) -> DataFrame:
    """Time-series resampling: densify each key's integer slot axis to
    every ``step`` between its min and max slot, then fill the gaps —
    ``fill='zero'`` (absent slot → 0) or ``fill='ffill'`` (carry the
    last observed value forward).

    The dense axis is generated per key with sequence+explode (no
    driver-side calendar, no cross join against a global spine — each
    key only materializes its own span). ffill is one
    last-value-ignore-nulls window per key ordered by slot: a single
    sort-shuffle on the key, which survives wide keys because no state
    crosses keys.

    ``value_cols``: {column: aggregate-less passthrough} mapping of
    value column -> fill mode override (currently all share ``fill``).
    """
    spans = df.groupBy(key_col).agg(
        F.min(slot_col).alias("__lo"), F.max(slot_col).alias("__hi")
    )
    dense = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(slot_col),
    )
    joined = dense.join(df, on=[key_col, slot_col], how="left")
    if fill == "zero":
        out = joined.select(
            key_col,
            slot_col,
            *[
                F.coalesce(F.col(c), F.lit(0).cast(joined.schema[c].dataType)).alias(c)
                for c in value_cols
            ],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(key_col)
            .orderBy(slot_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = joined.select(
            key_col,
            slot_col,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in value_cols
            ],
        )
    else:
        raise ValueError(f"unknown fill mode {fill!r}: use 'zero' or 'ffill'")
    return out
