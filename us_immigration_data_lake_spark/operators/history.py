"""Dimension-history operators: SCD Type-2 interval building and
keyed latest-wins upsert (the lakehouse MERGE pattern re-expressed as
pure DataFrame ops).

The reference materializes point-in-time dimension snapshots
(etl.py:169-183 builds each curated dim fresh per run); a warehouse
serving 100 TB of slowly-changing entities needs the historical form:
one row per (entity, state) version with a validity interval, plus an
incremental upsert to fold a new batch of changes into the base table.

Scale notes:
- ``scd2_history`` is two window passes over ONE shuffle: the change
  filter and the lead() both use the same (keys) hash partitioning,
  so the second window re-sorts within partitions but never
  re-shuffles.
- ``merge_upsert`` is a single aggregation (groupBy keys +
  max(struct); struct buffers plan as SortAggregate, still
  partial+final): partial aggregation collapses per-key candidates
  map-side, so the shuffle moves at most one row per key per map
  task — strictly cheaper than the window row_number() formulation,
  which must move every candidate row to sort it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    state_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Collapse an event log into SCD2 validity intervals.

    For each entity (``keys``), order events by (``ts_col``,
    ``tiebreak``) and keep only rows where any of ``state_cols``
    differs (null-safely) from the previous event — these start a new
    version. Each version's ``valid_to`` is the next version's
    ``valid_from``; the open version has ``valid_to`` NULL and
    ``is_current`` true.

    ``tiebreak`` must be unique per (keys, ts) — without a total
    order, same-timestamp state flips would make the kept version
    run-dependent.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in state_cols])
    prev = F.lag(cur).over(w)
    starts = (
        df.withColumn("_chg", prev.isNull() | ~cur.eqNullSafe(prev))
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        starts.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*keys, *state_cols, "valid_from", "valid_to", "is_current")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    precedence: list[str] | None = None,
) -> DataFrame:
    """Keyed latest-wins upsert: rows from ``updates`` replace
    same-key rows in ``base``; new keys are appended (MERGE ...
    WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT).

    ``precedence`` columns (e.g. a version or commit timestamp) rank
    candidates within a key, highest wins; ties always resolve to the
    updates side, then to the lexicographically-largest payload, so
    the result is deterministic even with duplicate keys on input.

    Both frames must share ``base``'s column set (extra update-side
    columns are dropped).
    """
    cols = base.columns
    tagged = base.select(*cols).withColumn("_src", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_src", F.lit(1))
    )
    # rank prefix gets distinct aliases (a precedence column is usually
    # also a payload column — duplicate struct field names would make
    # the payload access ambiguous); payload rides as a nested struct
    # that doubles as the final tiebreak.
    rank_fields: list[Column] = [
        F.col(c).alias(f"_p{i}") for i, c in enumerate(precedence or [])
    ]
    rank_fields.append(F.col("_src").alias("_src"))
    rank_fields.append(F.struct(*[F.col(c) for c in cols]).alias("_row"))
    won = tagged.groupBy(*keys).agg(F.max(F.struct(*rank_fields)).alias("_w"))
    return won.select(*[F.col(f"_w._row.{c}").alias(c) for c in cols])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture diff of two keyed snapshots.

    Returns (keys..., change_type STRING) for every key whose state
    differs: 'added' (key only in ``new``), 'removed' (only in
    ``old``), 'changed' (present in both, any ``compare_cols``
    differs — NULLs compared distinct-aware). Unchanged keys emit
    nothing, so at 100 TB the output is proportional to the churn,
    not the table. A NULL-keyed row (broken upstream, but real)
    never equi-joins, so it reports as 'removed' (from old) or
    'added' (from new) with its NULL key visible — never silently
    misclassified.

    Plan: one FULL OUTER equi-join on the keys (both sides shuffle
    once, AQE handles skew) projecting only keys + compared columns —
    the minimal-width diff. Rows are classified with null-safe
    equality (``eqNullSafe``) so NULL→value and value→NULL register
    as changes.
    """
    # Presence is tracked with explicit marker columns, NOT key
    # nullness: a NULL-keyed source row never equi-joins, and inferring
    # presence from its own key column would classify it 'added'
    # regardless of which snapshot it came from.
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__ov_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__nv_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = o[f"__ok_{k}"] == n[f"__nk_{k}"]
        cond = eq if cond is None else cond & eq
    j = o.join(n, on=cond, how="full_outer")
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
        )
    )
