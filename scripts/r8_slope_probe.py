#!/usr/bin/env python3
"""Round-8 slope probe: edit-distance join + incremental corpus update
at 1x/3x/10x rows (r7 verdict ask #2).

q197/q200's registrations are input-capped so their oracles stay
exactly replayable — a bench slope through them would be a q186-style
artifact. This probes the OPERATORS uncapped on the scaled fixtures:

- edit_distance_pairs over the q197 name derivation (16-char lowercase
  text prefixes) on the FULL documents table: the gram-branch
  self-join inherits skew from true gram frequency — candidate volume
  is sum(freq^2) over distinct grams, the axis the verdict flagged.
- update_corpus_increment (odd/even doc split, production xxhash64
  path): the full weekly-ingest composite — quality gate + cross-dedup
  + within-batch dedup + CC — end to end.

Usage: python3 scripts/r8_slope_probe.py [edit|corpus] ...
Prints one JSON line per probe. scale_probe.py handles q198/q199/q201
(uncapped registrations, fold input scale-invariant by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from us_immigration_data_lake_spark.operators import dedup as dd  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = {
    "1x": "/root/testdata/sf0.1",
    "3x": os.path.join(REPO, ".localdata", "sf0.3x"),
    "10x": os.path.join(REPO, ".localdata", "sf1.0x"),
}


def names(spark, d):
    return (
        spark.read.parquet(os.path.join(d, "documents.parquet"))
        .select(
            "doc_id",
            F.substring(F.lower(F.col("text")), 1, 16).alias("name"),
        )
        .filter(F.col("name").rlike("^[ -~]*$"))
    )


def probe_edit(spark) -> dict[str, float]:
    out: dict[str, float] = {}
    for label, d in DIRS.items():
        plan = lambda: dd.edit_distance_pairs(
            names(spark, d), "doc_id", "name", max_distance=2, q=3
        )
        plan().write.mode("overwrite").format("noop").save()
        t0 = time.perf_counter()
        plan().write.mode("overwrite").format("noop").save()
        out[label] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    return out


def probe_corpus(spark) -> dict[str, float]:
    from us_immigration_data_lake_spark.pipelines.corpus import (
        update_corpus_increment,
    )

    out: dict[str, float] = {}
    for label, d in DIRS.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        new_df = docs.filter(F.col("doc_id") % 2 == 1)
        ref_df = docs.filter(F.col("doc_id") % 2 == 0)

        def run():
            _, st = update_corpus_increment(
                new_df, ref_df, "doc_id", "text", min_quality=0.3,
                shingle_n=3, num_hashes=64, bands=16, threshold=0.5,
                max_bucket_size=1000,
            )
            return st

        run()  # first-touch
        t0 = time.perf_counter()
        st = run()
        out[label] = round(time.perf_counter() - t0, 3)
        print(f"# corpus {label}: {st}", file=sys.stderr)
        spark.catalog.clearCache()
    return out


def main() -> None:
    which = sys.argv[1:] or ["edit", "corpus"]
    spark = get_spark("r8-slope-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    if "edit" in which:
        results["edit_distance_pairs"] = probe_edit(spark)
    if "corpus" in which:
        results["update_corpus_increment"] = probe_corpus(spark)
    print(json.dumps({"probe": "r8_slopes", "results": results}))


if __name__ == "__main__":
    main()
