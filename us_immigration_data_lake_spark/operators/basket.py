"""Market-basket co-occurrence: which items appear together in the
same group (order, session, document) — the counting core of
association mining and "frequently bought together".

Scale design: the pair explosion is QUADRATIC in group size, so the
operator is shaped to keep that bounded and visible:

- presence first: ``distinct`` on (group, item) so multiplicity inside
  a group can't inflate pairs (and the self-join input is minimal);
- the self-join is an EQUI-join on the group key — both sides shuffle
  once on the same key and pairs materialize co-partitioned; no
  cross-join is reachable;
- ``max_group_size`` caps pathological groups (a basket with 10k items
  contributes 50M pairs): groups above the cap are dropped BEFORE the
  join via one cheap count aggregation, the standard guard in
  production co-occurrence jobs. The cap is a declared semantic, not a
  silent truncation — callers pick it per dataset (lineitem order
  groups are ≤ 7 items, so the default 1000 never triggers there).

The canonical (a < b) orientation halves the pair space and makes the
count table unique per unordered pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
    max_group_size: int = 1000,
) -> DataFrame:
    """Unordered co-occurrence counts: (item_a, item_b, n_groups) with
    item_a < item_b, kept when n_groups >= min_support."""
    pres = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("__i")
    ).distinct()
    sized = pres.groupBy("__g").agg(F.count(F.lit(1)).alias("__sz"))
    pres = pres.join(
        sized.filter(F.col("__sz") <= max_group_size).select("__g"), "__g"
    )
    a = pres.select(F.col("__g"), F.col("__i").alias("item_a"))
    b = pres.select(F.col("__g"), F.col("__i").alias("item_b"))
    pairs = a.join(b, "__g").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .filter(F.col("n_groups") >= min_support)
    )
