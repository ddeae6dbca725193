"""Join operators (SURVEY.md §2.3).

The reference has two joins: a composite-key inner self-join of two
aggregates of one source (etl.py:186 — an anti-pattern we re-express as
a single groupBy, see aggregate.py) and a left join onto a lowercased
name key (etl.py:388). Neither broadcasts although both right sides are
tiny dims. Here every dim join broadcasts explicitly; at 100 TB a
shuffled sort-merge join against a 288-row lookup is pure waste.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact ⋈ dimension with a broadcast hint on the dim side.

    With AQE on, Spark would often convert at runtime anyway, but the
    hint removes the initial shuffle planning entirely and is exact for
    known-small dims (nation=25, region=5 rows; reference lookup=288).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    on_arg = list(on) if isinstance(on, Sequence) and not isinstance(on, str) else on
    return fact.join(d, on=on_arg, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of left with ≥1 match in right; right columns never
    materialize → Catalyst can plan a broadcast/hash LeftSemi with only
    the join keys shipped."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of left with NO match in right (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """Non-equi interval join: left.point ∈ [right.lo, right.hi).

    Broadcast-nested-loop when right is small (the only sane plan);
    at scale, bucket both sides by a coarse range key first.
    """
    r = F.broadcast(right) if broadcast_right else right
    cond = (left[point_col] >= r[lo_col]) & (left[point_col] < r[hi_col])
    return left.join(r, on=cond, how="inner")
