"""Order-statistics operators: weighted median and 2-D skyline
(Pareto frontier) — both as single-sort window plans, never the
O(n²) dominance/self-join formulations.

Weighted median (per group): sort the group's values once, take a
running sum of weights, and pick the smallest value whose cumulative
weight reaches half the total. Integer weights and integer-ized values
make the pick bit-deterministic (rule 1: no raw-double accumulation).

2-D skyline: minimize ``x``, maximize ``y``. A row is dominated iff
some row has x' <= x and y' >= y with at least one strict. After ONE
sort by x, dominance collapses to two window maxima:
- ``max(y) over x strictly lower``  (RANGE frame ending 1 before the
  current x value) — catches x' < x, y' >= y;
- ``max(y) over same x``            (partition by x) — catches
  x' = x, y' > y.
Cost: one sort-shuffle — survives 100× scale-up where the NOT EXISTS
self-join (the obvious spec, used as the DuckDB oracle) is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted lower median of an integral value column.

    Returns (group_cols..., w_median BIGINT, total_weight BIGINT):
    the smallest value v such that sum(weight | value <= v) * 2 >=
    total weight. Ties in ``value_col`` are merged by the cumulative
    sum, so the result does not depend on intra-value row order.
    """
    cum = Window.partitionBy(*group_cols).orderBy(F.col("__v")).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*group_cols)
    scored = df.select(
        *group_cols,
        F.col(value_col).cast("long").alias("__v"),
        F.col(weight_col).cast("long").alias("__w"),
    ).withColumn("__cum", F.sum("__w").over(cum)).withColumn(
        "__tot", F.sum("__w").over(tot)
    )
    return (
        scored.filter(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(*group_cols)
        .agg(
            F.min("__v").alias("w_median"),
            F.max("__tot").alias("total_weight"),
        )
    )


def _not_dominated(df: DataFrame, x, y, partition_cols: list) -> DataFrame:
    """Filter to rows not dominated within their window partition."""
    lower_x = (
        Window.partitionBy(*partition_cols)
        .orderBy(x)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_x = Window.partitionBy(*partition_cols, x)
    scored = df.withColumn("__max_y_lower", F.max(y).over(lower_x)).withColumn(
        "__max_y_same", F.max(y).over(same_x)
    )
    dominated = (
        F.coalesce(F.col("__max_y_lower") >= y, F.lit(False))
    ) | (F.col("__max_y_same") > y)
    return scored.filter(~dominated).drop("__max_y_lower", "__max_y_same")


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Rows on the Pareto frontier of (minimize ``minimize_col``,
    maximize ``maximize_col``). Duplicate (x, y) points all survive
    (neither dominates the other — dominance requires one strict
    inequality). Columns must be integral (integer-ize money first).

    Two exact phases so no stage ever globally sorts the full input:
    1. local skyline inside each x-range bucket (windows partitioned
       by ``floor(x / bucket_width)`` — distributed);
    2. global skyline over the phase-1 survivors — correct because
       dominance is transitive (any global dominator eliminated
       locally is itself dominated by a surviving row), and cheap
       because a bucket's survivors are its frontier only (for truly
       adversarial inputs where frontiers are huge, recurse with a
       coarser width instead).
    """
    x = F.col(minimize_col).cast("long")
    y = F.col(maximize_col).cast("long")
    w = int(bucket_width)
    bucket = F.expr(
        f"(CAST({minimize_col} AS BIGINT) - pmod(CAST({minimize_col} AS BIGINT), {w}))"
        f" div {w}"
    )
    local = _not_dominated(df.withColumn("__bx", bucket), x, y, ["__bx"])
    return _not_dominated(local, x, y, []).drop("__bx")
