#!/usr/bin/env python3
"""Round-11 late slope probe: the two newest ops — MinHash estimator
calibration (q223's core) and the deterministic epoch shuffle (q224's
core) — at 1x/3x/10x document rows.

Claims under test:
- epoch_shuffle_order is ONE hash shuffle + a partition-local sort
  (no global ordering exchange): wall-clock ~linear in rows.
- minhash_estimate_calibration's pair space is the banded candidate
  set with the counted bucket cap, and both comparison sides are
  per-pair array arithmetic on the cached signature frame: wall-clock
  tracks the near-dup pipeline's measured at-or-below-linear curve
  (pairs scale ~k on the disjoint-per-copy fixtures), not pairs².

Probes run the PERF hash path (portable=False — md5 is the
correctness-gate spelling, xxhash64 the scale path) over the full
scaled documents frames. Usage: python3 scripts/r11b_slope_probe.py
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

from us_immigration_data_lake_spark.operators.dedup import (  # noqa: E402
    minhash_estimate_calibration,
)
from us_immigration_data_lake_spark.operators.sampling import (  # noqa: E402
    curriculum_order,
    epoch_shuffle_order,
    mixture_interleave_order,
    per_group_cap,
    temperature_mixture_weights,
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
    spark = get_spark("r11b-slope-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for label, d in DIRS.items():
        docs = spark.read.parquet(f"{d}/documents.parquet")
        out.setdefault("epoch_shuffle", {})[label] = _timed_noop(
            lambda: epoch_shuffle_order(docs, "doc_id", epoch=3, n_shards=32)
        )
        out.setdefault("minhash_calibration", {})[label] = _timed_noop(
            lambda: minhash_estimate_calibration(
                docs, "doc_id", "text", shingle_n=2, num_hashes=24,
                bands=6, portable=False, max_bucket_size=1000,
            )
        )
        out.setdefault("per_group_cap", {})[label] = _timed_noop(
            lambda: per_group_cap(
                docs.select("doc_id", "source"), "source", "doc_id", cap=50
            )
        )
        out.setdefault("curriculum_order", {})[label] = _timed_noop(
            lambda: curriculum_order(
                docs.select(
                    "doc_id",
                    (F.col("n_chars").cast("double") / 1e4).alias("s"),
                ),
                "doc_id", "s", n_bins=4,
            )
        )

        def _interleave():
            sized = docs.select(
                "lang", F.col("n_chars").cast("long").alias("n_tok")
            )
            weights = temperature_mixture_weights(sized, "lang", "n_tok")
            return mixture_interleave_order(
                docs.select("doc_id", "lang"), "doc_id", "lang", weights,
            )

        out.setdefault("mixture_interleave", {})[label] = _timed_noop(
            _interleave
        )
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
