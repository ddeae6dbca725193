"""Deterministic hash-based sampling (SURVEY.md §2.10 extension —
corpus rebalancing: downsample over-represented strata, e.g. by
language or source, when assembling a training mix).

Why not ``df.sample()`` / ``sampleBy()``: their selections depend on
partitioning and seed plumbing, so results change under repartition,
AQE re-planning, or task retry.  A content-hash rule — keep row iff
``md5(id) mod 100 < rate`` — is a pure per-row predicate: reproducible
across engines and runs, stable under retries, joinable (the same id
always lands on the same side), and it composes with the train/test
split in ``functions/splits.py`` because both draw from the same
md5-bucket stream but can use distinct bucket digits.

Plan shape at 100 TB: a map-side filter — no shuffle, no state, and
the md5 feeds straight into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.functions.splits import hash_split_bucket


def sample_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 hex digits 5-8 —
    the same single-definition formula as the train/test split
    (functions/splits.py, digits 1-4), at a distinct offset so the
    two are independent draws."""
    return hash_split_bucket(id_col, buckets, digit_offset=5)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``rates_pct[stratum]`` percent of each stratum's rows,
    chosen deterministically by id hash (``default_pct`` for strata
    not listed).  Rates are integer percents so the predicate is
    exact — no float thresholds.
    """
    for stratum, pct in rates_pct.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {stratum!r} must be 0..100, got {pct}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct must be 0..100, got {default_pct}")
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(sample_bucket(id_col) < rate)
