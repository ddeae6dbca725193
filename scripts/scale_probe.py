#!/usr/bin/env python3
"""Per-query scaling probe: time named headliners solo at one fixture dir.

Usage:
    python3 scripts/scale_probe.py SF_DIR q01_pricing_summary q182_... ...
    python3 scripts/scale_probe.py SF_DIR          # all bench headliners

Prints one JSON line {"sf_dir": ..., "queries": {name: sec}}.

This is the measurement half of SCALE.md's 3-point scaling table
(r5 verdict ask #6, completed r7): fixtures come from
scripts/make_scaled_fixture.py (.localdata/sf0.3x, .localdata/sf1.0x);
each query gets one untimed warm-up pass at the TARGET dir (codegen +
file-index + page-cache first-touch, same protocol as bench.py) and
then one timed noop-sink execution. Run on an idle host — a contended
r6 attempt inflated one measurement 11x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_immigration_data_lake_spark.plans.queries import QUERIES  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or [n for n, s in QUERIES.items() if s.bench]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in names:
        for _ in range(2):  # codegen warm-up at the smallest sf
            QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        # one untimed first-touch pass at the target dir, then the timed run
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
