"""Physical-plan audits: correctness tests prove the answer is right;
these prove the PLAN is the one we'd want at 100 TB (SURVEY.md §4).

Each assertion is a property that must survive a scale-up:
- filters/column-pruning pushed into the parquet scan,
- dim joins broadcast (no shuffle of the fact side's join key),
- global top-k planned as TakeOrderedAndProject (no full sort),
- no row-wise Python UDFs anywhere (BatchEvalPython),
- single-pass aggregation for the demographics pivot (no self-join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from us_immigration_data_lake_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q01_filter_and_pruning_pushed(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [" in plan
    # projection pruned to the 7 needed columns — shipdate filter pushed
    assert "l_shipdate" in plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q07_dim_join_broadcasts(spark):
    plan = _plan(spark, "q07_segment_pivot")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q04_topk_is_take_ordered(spark):
    plan = _plan(spark, "q04_top_revenue_orders")
    assert "TakeOrderedAndProject" in plan


def test_no_python_udfs_in_batch_queries(spark):
    # every batch query must stay JVM-side; the only sanctioned Python
    # is Arrow-grouped kernels (mapInPandas/applyInPandas) and
    # applyInPandasWithState in streaming (q28). The REGISTRY-WIDE
    # enforcement lives in test_plan_lint.py::test_registry_lints_clean
    # (lint.py flags BatchEvalPython at error severity for all 200+
    # plans); duplicating that full sweep here cost 65 s of identical
    # plan builds (r9 durations profile), so this keeps a direct
    # SAMPLE check on the headline bench set only — an independent
    # assertion path in case the lint rule itself regresses. EAGER
    # fns (result_schema set — building them EXECUTES the pipeline)
    # are excluded too: the lint sweep and the parity prefetch already
    # execute each of them, and a third multi-second run buys no new
    # signal for this sample check (r11 durations profile: 41 s → <10 s).
    from concurrent.futures import ThreadPoolExecutor

    names = [
        name
        for name, spec in QUERIES.items()
        if "streaming" not in spec.tags
        and spec.bench
        and spec.result_schema is None
    ]
    # plan builds are independent driver work — pool them like the
    # parity prefetch (serial form: 23 s in the r11 durations profile)
    with ThreadPoolExecutor(max_workers=16) as ex:
        for name, plan in zip(names, ex.map(lambda n: _plan(spark, n), names)):
            assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"


def test_whole_stage_codegen_active(spark):
    # AQE wraps the plan and hides codegen spans until runtime; check
    # the non-adaptive physical plan, where codegen stages are static
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q01_pricing_summary"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # codegen stages render as "*(n) Operator" in plan toString
        assert "*(1)" in plan and "*(2)" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_demographics_pivot_is_single_aggregate(spark):
    # the reference joins two aggregates of one source (etl.py:186);
    # ours must be ONE aggregate — no join operator in the plan
    from us_immigration_data_lake_spark.pipelines import build_demographics

    raw = spark.createDataFrame(
        [("A", "S", "SC", "1.0", "1", "2", "3", "4", "5", "2.0", "White", "7")],
        ["City", "State", "State Code", "Median Age", "Male Population",
         "Female Population", "Total Population", "Number of Veterans",
         "Foreign-born", "Average Household Size", "Race", "Count"],
    )
    plan = build_demographics(raw)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_asof_join_single_shuffle(spark):
    plan = _plan(spark, "q29_asof_purchase_view")
    # merge-pattern as-of join: union + one window sort, never a
    # broadcast-nested-loop or cartesian plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aqe_splits_skewed_join(spark):
    """AQE skew handling: a join where one key holds most of the rows
    must complete without a single straggler partition dominating —
    the OptimizeSkewedJoin rule splits the hot partition at runtime."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # 95% of left rows share key 0; right is uniform
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        right = spark.range(0, 200_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = left.join(right, on="k")
        # collect() executes THIS frame's queryExecution so AQE
        # finalizes it (count() would spawn a separate execution)
        n = len(joined.collect())
        assert n == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the hot partition is recorded as split in the final plan
        assert "skew=true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_q57_bm25_broadcasts_stats_not_corpus(spark):
    """BM25's corpus stats (1 row) and per-term doc frequencies (|terms|
    rows) must reach the scoring join as broadcasts; the document side
    must never broadcast or re-shuffle beyond its one id repartition."""
    import re

    plan = _plan(spark, "q57_bm25_topk")
    # count numbered plan NODES, not substrings — explain formatted
    # prints every node name twice (tree line + details), which made a
    # raw count() >= 2 vacuously true with a single join
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert sum(j.startswith("Broadcast") for j in joins) >= 2, joins
    assert all(j.startswith("Broadcast") for j in joins), joins  # no SMJ/cartesian
    assert "BatchEvalPython" not in plan  # no row-wise Python anywhere


def test_q58_multiterm_topk_is_take_ordered(spark):
    """The multi-term ranking must reduce to top-k via
    TakeOrderedAndProject before any rank window — an unpartitioned
    window over the whole corpus would funnel it through one task."""
    import re

    plan = _plan(spark, "q58_bm25_multiterm")
    assert "TakeOrderedAndProject" in plan
    # node ids are child-first: the rank Window's input must be the
    # already-reduced TakeOrderedAndProject (k rows), not the corpus
    ids = {
        m.group(2): int(m.group(1))
        for m in re.finditer(r"\((\d+)\) (TakeOrderedAndProject|Window)", plan)
    }
    assert ids["TakeOrderedAndProject"] < ids["Window"]


def test_q117_part_filter_pushed_and_threshold_broadcast(spark):
    # Q17 shape: the brand filter must reach the part scan; both the
    # filtered dim and the per-part moments are broadcast (never a
    # fact-side shuffle for the threshold lookup).
    plan = _plan(spark, "q117_small_qty_revenue")
    assert "EqualTo(p_brand,Brand#13)" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q119_derived_dim_filter_reaches_part_scan(spark):
    # Q19 shape: the hand-derived union-of-disjuncts filter must show
    # up as pushed part-scan filters (brand In-set), proving the dim
    # shrinks before the broadcast.
    plan = _plan(spark, "q119_disjunctive_join")
    read_part = plan.split("part.parquet")[1]
    assert "p_brand" in read_part.split("ReadSchema")[0]


def test_q120_exists_pair_stays_on_one_key(spark):
    # Q21 shape: the EXISTS/NOT-EXISTS pair must compile to semi+anti
    # hash joins keyed on l_orderkey with the suppkey inequality as a
    # residual condition — never a nested-loop over the fact.
    plan = _plan(spark, "q120_sole_blame_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q126_fact_not_shuffled_before_prune(spark):
    # Bloom-pruned join: the full fact table must reach its semi-join
    # prune via scan (+filter) only — any Exchange directly on the
    # raw fact branch would defeat the runtime-filter pattern.
    plan = _plan(spark, "q126_bloom_pruned_join")
    assert "LeftSemi" in plan
    # the only aggregations before the final one run on the DISTINCT
    # probe keys / bit positions, not the fact payload
    assert "l_extendedprice" not in plan.split("LeftSemi")[1].split("(1) Scan")[0]


def test_q123_topk_uses_window_group_limit(spark):
    # per-doc top-3 must use the rank-limit pushdown (partial top-k
    # before the shuffle), not a full per-group sort + filter.
    plan = _plan(spark, "q123_tfidf_topk")
    assert "WindowGroupLimit" in plan


def test_q114_single_aggregate_no_window(spark):
    # OLS is a pure moment aggregate: one partial+final hash agg, no
    # window, no join back to the rows.
    plan = _plan(spark, "q114_groupwise_ols")
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_q145_semi_join_with_residual_date_predicate(spark):
    # Q4 shape: the EXISTS compiles to a LEFT SEMI hash join (never a
    # nested loop) with the quarter filter pushed into the orders scan.
    plan = _plan(spark, "q145_priority_check")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q141_sketch_probe_broadcasts_sketch(spark):
    # count-min probe side: the bounded cell table is broadcast; the
    # fact never shuffles through the sketch join.
    plan = _plan(spark, "q141_countmin_freq")
    assert "BroadcastHashJoin" in plan


def test_q149_pure_scan_agg_all_pushed(spark):
    # Q6 shape: no join, no window; all three predicates reach the
    # lineitem scan and the projection prunes to the 4 used columns.
    plan = _plan(spark, "q149_forecast_revenue")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "PushedFilters: [" in plan
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_discount" in read and "l_quantity" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q150_topk_is_take_ordered(spark):
    # Q10 shape: global top-20 must be TakeOrderedAndProject (partial
    # top-k per partition), never a full sort; the quarter filter is
    # pushed into the orders scan.
    plan = _plan(spark, "q150_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q153_one_fact_pass_conditional_agg(spark):
    # Q20 shape: both the total and the class-restricted quantity come
    # out of ONE aggregate over lineitem — no second fact scan, no
    # window, part broadcast.
    plan = _plan(spark, "q153_class_dominant_shippers")
    assert plan.count("lineitem.parquet") == 1
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_q154_dims_broadcast_no_sort_merge(spark):
    # Q9 shape: part (LIKE-filtered) and the supplier→nation chain are
    # broadcast; lineitem is the only shuffle input.
    plan = _plan(spark, "q154_product_profit")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q148_no_cartesian_and_part_filter_pushed(spark):
    # Q2 shape: the correlated MIN is a window over the (small) offers
    # relation, never a nested loop; the part class filter reaches the
    # part scan.
    plan = _plan(spark, "q148_min_price_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EqualTo(p_type,LARGE)" in plan


def test_q152_exclusion_is_broadcast_anti(spark):
    # Q16 shape: NOT IN over a key column compiles to a broadcast
    # LEFT ANTI hash join, never a nested loop.
    plan = _plan(spark, "q152_supplier_diversity")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q157_ivfpq_no_corpus_broadcast(spark):
    # IVF-PQ: the query-side frames broadcast; the corpus side never
    # appears under a BroadcastExchange and nothing is all-pairs.
    plan = _plan(spark, "q157_ivfpq_knn")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q158_boilerplate_prune_is_broadcast_anti(spark):
    # segment boilerplate: the (bounded) repeated-hash set broadcasts
    # into a LEFT ANTI join against the segment rows.
    plan = _plan(spark, "q158_segment_boilerplate")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
