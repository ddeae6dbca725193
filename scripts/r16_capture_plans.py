"""Capture .explain("formatted") for named queries (default: all bench
headliners) into plans/r16/<query>_<suffix>.txt — the r16 optimization
round's before/after plan evidence.

    python scripts/r16_capture_plans.py before [query ...]
    python scripts/r16_capture_plans.py after  [query ...]

Eager fns (q186's pipeline counts, streaming availableNow runs)
execute while building their frame — same cost the plan-hash snapshot
pays; their captured plan is the returned frame's (for q186 a local
one-row stats frame, by design — noted in the file header).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_immigration_data_lake_spark.plans.queries import QUERIES  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or [n for n, s in QUERIES.items() if s.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r16-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- {name} ({suffix}) at {sf_dir}\n")
            f.write(plan)
        print(f"{name}: {len(plan)} chars")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
