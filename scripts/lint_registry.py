"""Registry-wide plan lint: run the physical-plan linter
(plans/lint.py) over every registered batch query and summarize.

Usage: python scripts/lint_registry.py [sf_dir]
Exit 1 if any error-severity finding appears outside the documented
exemptions (the input-restricted brute-force verification baselines).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from us_immigration_data_lake_spark.plans.lint import (  # noqa: E402
    CARTESIAN_EXEMPT,
    UNION_AGG_EXEMPT,
    lint_plan,
)
from us_immigration_data_lake_spark.plans.queries import QUERIES  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lint-registry")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, spec in QUERIES.items():
        if "streaming" in spec.tags:
            continue
        findings = lint_plan(spec.fn(spark, sf_dir))
        errors = [
            f
            for f in findings
            if f.severity == "error"
            and not (f.rule == "cartesian-product" and name in CARTESIAN_EXEMPT)
        ]
        # union-partitioned-aggregate escalates to error for any query
        # outside the adjudicated six (r13 verdict ask #2) — same rule
        # as tests/test_plan_lint.py's registry gate
        if name not in UNION_AGG_EXEMPT:
            errors += [
                f for f in findings
                if f.rule == "union-partitioned-aggregate"
            ]
        warns = [
            f for f in findings
            if f.severity == "warn" and f not in errors
        ]
        if errors or warns:
            print(f"{name}:")
            for f in errors + warns:
                print(f"  [{f.severity.upper()}] {f.rule}: {f.message}")
            bad += len(errors)
    print(f"\nlint sweep: {bad} unexempted error-severity finding(s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
