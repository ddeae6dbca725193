#!/usr/bin/env python3
"""Round-11 slope probe (r10 verdict Next #6 / r9 ask #5): the
global_cumsum consumer family — exact KS (q212), PSI (q213), ROC-AUC
(q215's metric core) and the new r11 PR-AUC — at 1x/3x/10x document
rows. Claim under test: each plan is one map-side-combinable groupBy
over distinct values (or <= B bins) + the two-phase global_cumsum
(range exchange + parallel per-partition cumsums + a
numPartitions-sized offset collect + localCheckpoint) + one final
aggregate — so wall-clock grows at or below linear in rows and the
driver-side offset collect stays FLAT (it is numPartitions-sized, not
data-sized).

The metric cores are timed directly over the scaled documents frames
(y = lang='en', score = n_chars — the same columns the registry
queries bin) rather than through q215's NB-training prefix: the
training slope is q203/q206's already-measured story; the unmeasured
machinery is the cumsum consumers.

Usage: python3 scripts/r11_slope_probe.py
Prints one JSON line. Run SOLO (concurrent Spark work measured 11x
inflation on one r6 probe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from us_immigration_data_lake_spark.operators import training as tr  # noqa: E402
from us_immigration_data_lake_spark.operators.regress import (  # noqa: E402
    ks_two_sample,
    psi_drift,
)
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = {
    "1x": "/root/testdata/sf0.1",
    "3x": os.path.join(REPO, ".localdata", "sf0.3x"),
    "10x": os.path.join(REPO, ".localdata", "sf1.0x"),
}


def _timed_noop(plan) -> float:
    plan().write.mode("overwrite").format("noop").save()  # first touch
    t0 = time.perf_counter()
    plan().write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("r11-slope-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {
        "ks": {}, "psi": {}, "roc_auc": {}, "pr_auc": {},
    }
    rows: dict[str, int] = {}
    for label, d in DIRS.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        rows[label] = docs.count()
        scored = docs.select(
            (F.col("lang") == "en").cast("long").alias("__y"),
            F.col("n_chars").cast("long").alias("__s"),
        )
        out["ks"][label] = _timed_noop(
            lambda: ks_two_sample(docs, "lang", "n_chars", "en", "zh")
        )
        out["psi"][label] = _timed_noop(
            lambda: psi_drift(
                docs, "lang", "n_chars", "en", "zh", lo=0, width=50,
                n_bins=12,
            )
        )
        out["roc_auc"][label] = _timed_noop(
            lambda: tr.roc_auc_exact(scored, "__y", "__s")
        )
        out["pr_auc"][label] = _timed_noop(
            lambda: tr.pr_auc_exact(scored, "__y", "__s")
        )
        spark.catalog.clearCache()
    print(json.dumps({"rows": rows, "sec": out}))


if __name__ == "__main__":
    main()
