"""Physical-plan linter: the repo's plan-audit discipline
(tests/test_plans.py, SURVEY.md §4) as a callable library feature —
run it against any DataFrame before launching a 10-hour job and get
the scale anti-patterns a reviewer would flag.

Each rule inspects the FORMATTED physical plan (the same text
``df.explain("formatted")`` prints, which is stable, greppable, and
includes scan metadata like PushedFilters/ReadSchema that the plan
tree objects do not expose to Python). Rules are heuristics with
documented false-positive modes — the linter REPORTS, the caller
decides; nothing here mutates the plan.

Severity:
- ``error``: almost certainly wrong at scale (cartesian product over
  non-trivial inputs, row-wise Python UDF in the hot path);
- ``warn``: legitimate in specific shapes but worth a look (global
  sort without limit, no pushed filters on a filtered scan,
  sort-merge join where one side is a scanned dim table);
- ``info``: observations that help tuning (number of shuffles,
  codegen coverage).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    rule: str
    severity: str  # error | warn | info
    message: str


# Documented verification-grade baselines whose cross join is the
# point (input-restricted by contract; see the similarity.py and q19
# docstrings). The ONLY registry queries allowed an error-severity
# cartesian-product finding — shared by scripts/lint_registry.py and
# tests/test_plan_lint.py so the gate and the report can't drift.
CARTESIAN_EXEMPT = frozenset(
    {
        "q22_knn_cosine",
        "q19_ngram_jaccard",
        "q34_embedding_near_dups",
        # q230: verification-grade all-pairs mining on a contract-
        # restricted slice (vec_id bound in the registry fn); the scale
        # path is srp_lsh_knn candidates + cluster anti-join — see
        # similarity.py:hard_negatives docstring
        "q230_hard_negatives",
    }
)

# The six registry queries whose keyed-aggregate-over-Union tree shape
# (the r13 trainers'-bug signature) is ADJUDICATED runtime-sound: their
# union-fed aggregates execute 1:1 per group key, gated every suite by
# tests/test_plan_lint.py::test_union_agg_shapes_runtime_cardinality.
# The registry lint sweep treats the union-partitioned-aggregate warn
# as an ERROR for any query NOT in this set (r13 verdict ask #2's
# "error-with-exemptions for new queries"): a new query adopting the
# shape must be adjudicated — add its runtime-cardinality case to the
# gate — before it can land here.
UNION_AGG_EXEMPT = frozenset(
    {
        "q121_incremental_agg",
        "q142_kmv_jaccard",
        "q156_hll_distinct",
        "q165_histogram_quantiles",
        "q169_hll_overlap",
        "q197_edit_distance_join",
    }
)


def unexempted_error_rules(name: str, findings: list["Finding"]) -> set[str]:
    """The registry gate's error-with-exemptions rule, single-sourced
    (used by BOTH tests/test_plan_lint.py's sweep and
    scripts/lint_registry.py so the CI gate and the report can't
    drift): error-severity findings minus the documented cartesian
    exemptions, PLUS the union-partitioned-aggregate warn escalated to
    error for any query outside the adjudicated six (r13 verdict ask
    #2 — a new query adopting the shape must land its runtime
    1:1-cardinality case and an exemption entry first)."""
    rules = {
        f.rule
        for f in findings
        if f.severity == "error"
        and not (f.rule == "cartesian-product" and name in CARTESIAN_EXEMPT)
    }
    if name not in UNION_AGG_EXEMPT:
        rules |= {
            f.rule for f in findings
            if f.rule == "union-partitioned-aggregate"
        }
    return rules


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_blocks(plan: str) -> list[str]:
    """The per-scan metadata blocks (between 'Scan parquet' headers)."""
    parts = re.split(r"\(\d+\) Scan ", plan)
    return parts[1:]


# Operators a partial→final aggregate pair can legitimately sit above
# while the grouping distribution flows through from deeper in the
# plan (project/filter/generate preserve partitioning; a broadcast
# join preserves its STREAM side's partitioning, which is the first
# child in the formatted tree).
_PARTITION_TRANSPARENT = (
    "Project",
    "Filter",
    "Generate",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
)


def _tree_op(line: str) -> str:
    m = re.match(r"^[\s:+\-*(]*([A-Za-z]+)", line)
    return m.group(1) if m else ""


def _tree_depth(line: str) -> int:
    m = re.match(r"^[\s:+\-*]*", line)
    return len(m.group(0))


def _union_partitioned_aggregate(plan: str) -> bool:
    """True iff a partial→final aggregate pair sits above a Union with
    no shuffle Exchange between them (r13 wrong-results root-cause,
    training.hashed_token_features): when every Union child reports
    the same hash partitioning (e.g. both end in
    RepartitionByExpression on the grouping key), the physical Union
    advertises that partitioning and the aggregate skips its
    exchange — but the union CONCATENATES child partitions, so each
    key lives in as many partitions as children and the "final"
    aggregate emits duplicate groups. Detection: two directly stacked
    HashAggregates (the no-exchange signature) whose first-child
    chain reaches a Union through partition-transparent operators
    only."""
    tree = plan.split("\n\n", 1)[0].splitlines()
    for i in range(len(tree) - 2):
        if _tree_op(tree[i]) != "HashAggregate":
            continue
        j = i + 1
        if (
            _tree_op(tree[j]) != "HashAggregate"
            or _tree_depth(tree[j]) <= _tree_depth(tree[i])
        ):
            continue
        # walk the first-child chain below the partial aggregate —
        # FIRST child only: each followed line must be strictly deeper
        # than the last, else the flat scan has fallen out of the
        # child's subtree into a sibling (r13 advisor false-positive:
        # after a transparent binary node like BroadcastHashJoin the
        # depth-blind walk continued through the stream child's leaf
        # into the build-side subtree and flagged a Union that never
        # feeds the aggregate's distribution). Transparent ops always
        # have a child, so line k+1 of a followed node is its first
        # child, never a sibling.
        k = j + 1
        depth = _tree_depth(tree[j])
        while (
            k < len(tree)
            and _tree_depth(tree[k]) > depth
            and _tree_op(tree[k]) in _PARTITION_TRANSPARENT
        ):
            depth = _tree_depth(tree[k])
            k += 1
        if (
            k < len(tree)
            and _tree_depth(tree[k]) > depth
            and _tree_op(tree[k]) == "Union"
        ):
            return True
    return False


def lint_plan(df: DataFrame) -> list[Finding]:
    plan = formatted_plan(df)
    findings: list[Finding] = []

    if _union_partitioned_aggregate(plan):
        findings.append(Finding(
            "union-partitioned-aggregate", "warn",
            "Keyed aggregate directly over a Union with no Exchange "
            "between them: correct ONLY if the runtime plan really "
            "co-locates each key in one partition. A measured variant "
            "of this shape (both union children pinned by "
            "RepartitionByExpression, a Generate in one child, the "
            "union self-joined against its own aggregate — r13, "
            "training.hashed_token_features) emitted one group per "
            "union child and silently doubled every gradient. VERIFY "
            "with a duplicate-group count on real data; to be safe, "
            "leave one union child unrepartitioned or materialize the "
            "union (localCheckpoint) before aggregating.",
        ))

    if "CartesianProduct" in plan:
        findings.append(Finding(
            "cartesian-product", "error",
            "CartesianProduct in the plan: O(|L|·|R|) pairs. Unless both "
            "sides are provably tiny, add an equi-key (bin/bucket the "
            "condition) — see operators/joins.py:binned_range_join.",
        ))
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(Finding(
            "nested-loop-join", "warn",
            "BroadcastNestedLoopJoin: every left row is tested against "
            "the broadcast side. Fine for a small broadcast side and a "
            "non-equi predicate; wrong if an equi-key exists.",
        ))
    if "BatchEvalPython" in plan:
        findings.append(Finding(
            "python-udf", "error",
            "Row-wise Python UDF (BatchEvalPython): each row crosses the "
            "JVM↔Python boundary individually. Use built-in expressions, "
            "or an Arrow-batched pandas_udf / mapInPandas.",
        ))
    # Sort blocks print "Arguments: [keys...], <global>, 0" — only a
    # global=true Sort is a full range-partitioned sort of the input;
    # partition-local sorts (SortAggregate inputs, SMJ sides, window
    # partitions) print false and are the normal cost of those plans.
    has_global_sort = any(
        re.search(r"\(\d+\) Sort\b.*?Arguments: \[.*?\], true, ", block, re.S)
        for block in re.split(r"\n\n", plan)
    )
    if has_global_sort and "TakeOrderedAndProject" not in plan:
        windowless = "Window" not in plan and "SortMergeJoin" not in plan
        if windowless and "GlobalLimit" not in plan:
            findings.append(Finding(
                "global-sort", "warn",
                "Global Sort without a limit, window, or sort-merge join: "
                "a full range-partitioned sort of the input. If this is a "
                "top-k, add the limit so TakeOrderedAndProject applies.",
            ))

    for block in _scan_blocks(plan):
        first_line = block.splitlines()[0] if block.splitlines() else ""
        if (
            re.search(r"PushedFilters: \[\]", block)
            and re.search(r"\n\(\d+\) Filter\b", plan)
        ):
            # info, not warn: the filter may legitimately be
            # un-pushable (computed column, post-join predicate) —
            # but a scan-side predicate that COULD push and didn't is
            # the single most expensive miss at 100 TB, so surface it
            findings.append(Finding(
                "unpushed-scan", "info",
                f"Scan {first_line.split()[0] if first_line else ''} has "
                "PushedFilters: [] while the plan contains Filter nodes. "
                "If any predicate references only this scan's columns, "
                "restructure so it reaches the reader.",
            ))
        rs = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if rs:
            n_cols = len([c for c in rs.group(1).split(",") if c.strip()])
            if n_cols > 20:
                findings.append(Finding(
                    "wide-scan", "warn",
                    f"Scan {first_line.split()[0] if first_line else ''} "
                    f"reads {n_cols} columns. If the query uses fewer, "
                    "project earlier so pruning reaches the reader.",
                ))

    # count only shuffle-exchange DETAIL headers: each node prints
    # twice in formatted mode (tree + detail) and BroadcastExchange
    # is not a data shuffle
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    findings.append(Finding(
        "shuffle-count", "info",
        f"{n_exchanges} shuffle Exchange(s) in the plan. Each is a full "
        "shuffle of its input; check that adjacent operations reuse one "
        "partitioning where keys allow.",
    ))
    if "WholeStageCodegen" not in plan and "AdaptiveSparkPlan" not in plan:
        findings.append(Finding(
            "no-codegen", "info",
            "No WholeStageCodegen span visible: expressions run "
            "interpreted (or the plan is fully adaptive-wrapped).",
        ))
    return findings


def lint_report(df: DataFrame) -> str:
    """Human-readable lint summary, worst first."""
    order = {"error": 0, "warn": 1, "info": 2}
    lines = []
    for f in sorted(lint_plan(df), key=lambda f: order[f.severity]):
        lines.append(f"[{f.severity.upper():5s}] {f.rule}: {f.message}")
    return "\n".join(lines)
