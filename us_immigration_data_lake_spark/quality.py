"""Declarative data-quality checks.

Generalizes the reference's ``quality_checks`` (etl.py:127-143), which
implements only a row-count>0 assert, toward the notebook's stated but
unimplemented intent ("Integrity constraints … Source/Count checks",
cell-29): row-count, PK uniqueness, null-rate ceilings, FK coverage.

Scale note: all checks for one table are computed in ONE aggregate pass
(a single job), not one action per check — the reference's
count-then-write pattern already executes every pipeline twice
(SURVEY.md §3 E1 step 4); a naive check framework would multiply that.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    table: str
    check: str
    passed: bool
    detail: str = ""


@dataclass
class QualitySuite:
    table_name: str
    min_rows: int = 1
    unique_keys: list[list[str]] = field(default_factory=list)
    max_null_rate: dict[str, float] = field(default_factory=dict)

    def run(self, df: DataFrame) -> list[CheckResult]:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for col, _ in self.max_null_rate.items():
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"__null_{col}")
            )
        for i, keys in enumerate(self.unique_keys):
            aggs.append(
                F.count_distinct(*[F.col(k) for k in keys]).alias(f"__uniq_{i}")
            )
        row = df.agg(*aggs).collect()[0].asDict()
        n = row["__n"]
        results = [
            CheckResult(
                self.table_name,
                "row_count",
                n >= self.min_rows,
                f"rows={n} min={self.min_rows}",
            )
        ]
        for col, ceiling in self.max_null_rate.items():
            rate = (row[f"__null_{col}"] / n) if n else 0.0
            results.append(
                CheckResult(
                    self.table_name,
                    f"null_rate:{col}",
                    rate <= ceiling,
                    f"rate={rate:.4f} ceiling={ceiling}",
                )
            )
        for i, keys in enumerate(self.unique_keys):
            distinct = row[f"__uniq_{i}"]
            results.append(
                CheckResult(
                    self.table_name,
                    f"pk_unique:{','.join(keys)}",
                    distinct == n,
                    f"distinct={distinct} rows={n}",
                )
            )
        return results


def profile_table(
    df: DataFrame,
    null_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
) -> DataFrame:
    """Single-pass data profile as a DataFrame (the queryable form of
    QualitySuite — one aggregate job, one output row): row count,
    per-column null counts, distinct counts, min/max. Feed it to
    dashboards or the correctness gate instead of collect()ing."""
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in null_cols or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    for c in distinct_cols or []:
        aggs.append(F.count_distinct(F.col(c)).alias(f"distinct_{c}"))
    for c in minmax_cols or []:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.agg(*aggs)


def fk_coverage(fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> CheckResult:
    """Fraction of non-null fact FKs present in the dim (anti-join —
    broadcast when dim is small)."""
    missing = (
        fact.select(F.col(fk)).where(F.col(fk).isNotNull())
        .join(F.broadcast(dim.select(F.col(pk).alias(fk))), on=fk, how="left_anti")
        .count()
    )
    return CheckResult("fk", f"fk_coverage:{fk}->{pk}", missing == 0, f"missing={missing}")


def assert_all(results: list[CheckResult]) -> None:
    failed = [r for r in results if not r.passed]
    if failed:
        lines = "; ".join(f"{r.table}/{r.check}: {r.detail}" for r in failed)
        raise ValueError(f"quality checks failed: {lines}")


def observe_quality(df: DataFrame, checks: dict):
    """Piggyback quality counters on a job with ``df.observe`` — the
    metrics accumulate DURING whatever action the caller runs next
    (write, count, collect), so profiling 100 TB costs zero extra
    passes (profile_table, by contrast, is its own aggregate job).

    ``checks``: name -> aggregate Column (e.g. F.count_if(c.isNull())).
    Returns (observed_df, observation); after the caller's action,
    ``observation.get`` yields {name: value}.
    """
    from pyspark.sql import Observation

    obs = Observation()
    named = [expr.alias(name) for name, expr in checks.items()]
    return df.observe(obs, *named), obs
