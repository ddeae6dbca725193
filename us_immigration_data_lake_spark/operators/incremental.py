"""Incremental aggregate maintenance (materialized-view delta merge).

Generalizes the reference's recompute-the-world batch aggregates
(etl.py:169-183 re-derives every dim table from scratch each run) to
the incremental pattern a 100 TB deployment needs: keep the GROUPED
PARTIAL STATE (count + exact sums per key), and on new data aggregate
ONLY the delta partition, then merge states.

Merge = unionByName + re-aggregate: every kept statistic must be an
associative/commutative monoid (count, sum, min, max — not avg, which
is derived at read time from sum/count). This is exactly Spark's own
partial-aggregate contract, applied across batch boundaries.

Scale: the merge shuffles |state| rows (one per key), never the raw
fact table; the delta aggregate reads only the new partition (pushed
partition filter). Recompute cost drops from O(total data) to
O(delta + keys) per refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    """Grouped partial state: n (count) + an exact integer sum per
    entry in ``sums`` (out_col -> input col, pre-integerized)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(src).cast("long").alias(dst) for dst, src in sums.items()],
    )


def merge_states(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial states over the same schema: keys appearing
    in either side survive; counts and sums add. Null-safe via the
    re-aggregation (a key missing from one side simply contributes
    fewer partial rows)."""
    value_cols = [c for c in base.columns if c not in keys]
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).cast("long").alias(c) for c in value_cols])
    )
