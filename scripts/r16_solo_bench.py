"""r16 optimization round: controlled SOLO timing of individual
headline queries — the repo's adjudication protocol (three timed reps
in a fresh session, bracketed by the bench's calibration anchor, noop
sink, cache cleared between reps; mirrors bench.py's per-query
methodology without the other 36 queries' JVM state).

Usage: python scripts/r16_solo_bench.py <query> [query ...]
         [--sf DIR] [--reps N]
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_immigration_data_lake_spark.plans.queries import QUERIES  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

ANCHOR_REF_SEC = 0.126  # bench.py's pinned r9 reference recording


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names: list[str] = []
    it = iter(range(1, len(sys.argv)))
    skip = False
    for i in range(1, len(sys.argv)):
        if skip:
            skip = False
            continue
        a = sys.argv[i]
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif a == "--reps":
            reps = int(sys.argv[i + 1])
            skip = True
        elif not a.startswith("--"):
            names.append(a)

    spark = get_spark("r16-solo-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(name: str, d: str) -> None:
        QUERIES[name].fn(spark, d).write.mode("overwrite").format(
            "noop"
        ).save()

    def _anchor(n: int = 3) -> float:
        path = f"{sf_dir.rstrip('/')}/lineitem.parquet"
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            spark.read.parquet(path).selectExpr(
                "count(*) AS n",
                "sum(cast(l_quantity AS bigint)) AS s",
                "sum(l_orderkey) AS k",
            ).collect()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples)

    # bench.py's warm-up: every requested query twice at the small sf
    for _ in range(2):
        for name in names:
            _noop(name, "/root/testdata/sf0.001")
    spark.catalog.clearCache()
    _anchor()  # anchor codegen/JIT warm-up, untimed

    out: dict[str, dict] = {}
    for name in names:
        _noop(name, sf_dir)  # first touch at the timed sf
        spark.catalog.clearCache()
        gc.collect()
        samples, anchors = [], [_anchor()]
        for _ in range(reps):
            t0 = time.perf_counter()
            _noop(name, sf_dir)
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            anchors.append(_anchor())
        ratio = statistics.median(anchors) / ANCHOR_REF_SEC
        med = statistics.median(samples)
        out[name] = {
            "samples": samples,
            "median": med,
            "anchor_ratio": round(ratio, 3),
            "median_norm": round(med / ratio, 3),
        }
        print(json.dumps({"query": name, **out[name]}), flush=True)
    print(json.dumps({"solo_bench": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
