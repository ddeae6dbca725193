from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from us_immigration_data_lake_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

_SPARK = None


def _make_spark():
    """Session-singleton test SparkSession — shared by the ``spark``
    fixture and by the collection-time background-sweep launcher
    below (both must see the SAME conf: get_spark is getOrCreate, so
    whoever runs first pins the session)."""
    global _SPARK
    if _SPARK is None:
        import os
        import tempfile

        # suite-tuning experiments (r13 verdict ask #7): override the
        # test session's reducer/parallelism counts without editing
        # this file — the r14 A/B measured 8 vs 4 vs 2 with it
        par = os.environ.get("SPARK_GRAFT_TEST_PARTITIONS", "8")
        wh = tempfile.mkdtemp(prefix="spark-warehouse-")
        _SPARK = get_spark(
            "tests",
            extra_conf={
                "spark.driver.memory": "6g",
                "spark.sql.warehouse.dir": wh,
                # test-only: 8 reducers instead of the engine's 32 —
                # suite inputs are toy-sized and every shuffle stage
                # otherwise schedules 32 near-empty tasks (pure
                # scheduler overhead; the r11 durations profile
                # attributed most suite wall to it). Correctness is
                # partition-count-independent — the driver-mimic sweep
                # runs the full registry under a DEFAULT-conf session
                # (200 partitions) every round.
                "spark.sql.shuffle.partitions": par,
                # same rationale for RDD-side parallelism:
                # createDataFrame over a handful of local rows
                # otherwise parallelizes into 32 near-empty tasks per
                # action
                "spark.default.parallelism": par,
            },
        )
        _SPARK.sparkContext.setLogLevel("ERROR")
    return _SPARK


@pytest.fixture(scope="session")
def spark():
    yield _make_spark()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# --- background registry sweeps (r12 verdict ask #6) -----------------------
# The suite's three singular wall-clock blocks — the oracle-parity
# prefetch (~123 s), the empty-table sweep (~93 s) and the registry
# plan lint (~66 s) — are all full-registry plan builds against the
# SAME SparkSession and fully independent of each other. Serially
# they cost their sum; launched here at collection-finish they
# overlap each other AND the front half of the suite (the plan-hash
# sentinel idiom, generalized). Each participating test module
# defines `start_background_sweep(spark, nodeids, executor)` which
# registers a Future into its own module global when (and only when)
# its consuming test was actually selected; the tests join that
# future and fall back to the inline path when it is absent (-k
# runs, xdist workers, collect-only).
_SWEEP_MODULES = ("test_oracle_parity", "test_empty_sweep", "test_plan_lint")
_SWEEP_EXECUTOR = None


def pytest_collection_finish(session):
    global _SWEEP_EXECUTOR
    import os

    if os.environ.get("PYTEST_XDIST_WORKER"):
        return
    if os.environ.get("SPARK_GRAFT_NO_BG_SWEEPS"):
        return
    if session.config.option.collectonly:
        return
    hooks = []
    for name in _SWEEP_MODULES:
        mod = sys.modules.get(name) or sys.modules.get(f"tests.{name}")
        hook = getattr(mod, "start_background_sweep", None) if mod else None
        if hook:
            hooks.append(hook)
    if not hooks:
        return
    nodeids = [item.nodeid for item in session.items]
    from concurrent.futures import ThreadPoolExecutor

    # one slot per sweep: each sweep fans out internally with its own
    # worker pool; this executor only carries the three orchestrating
    # threads
    _SWEEP_EXECUTOR = ThreadPoolExecutor(
        max_workers=len(hooks), thread_name_prefix="bg-sweep"
    )
    spark = _make_spark()
    for hook in hooks:
        # each sweep runs on its own newSession() CLONE (shared
        # SparkContext + CacheManager, PRIVATE SQLConf and temp-view
        # catalog): registry builders _tune() the session to the
        # engine's 32 shuffle partitions, which on the shared session
        # flipped the foreground tests' conf (8) mid-suite for every
        # concurrent test (r13 advisor). Cache state is still global —
        # tests that assert on it join the sweeps first
        # (wait_for_background_sweeps).
        hook(spark.newSession(), nodeids, _SWEEP_EXECUTOR)


def pytest_sessionfinish(session, exitstatus):
    if _SWEEP_EXECUTOR is not None:
        _SWEEP_EXECUTOR.shutdown(wait=False, cancel_futures=True)


def wait_for_background_sweeps(timeout: int = 1800) -> None:
    """Join any in-flight background sweeps. Tests that assert on
    SESSION-GLOBAL state (CacheManager emptiness) call this before
    their clearCache(): a still-running sweep registers cache entries
    concurrently, and without the join such a test races it on -k
    subsets where the sweep outlives the few foreground tests.
    Failures are swallowed here — the sweep's owning test reports
    them."""
    for name in _SWEEP_MODULES:
        mod = sys.modules.get(name) or sys.modules.get(f"tests.{name}")
        fut = getattr(mod, "_SWEEP_FUTURE", None) if mod else None
        if fut is not None:
            try:
                fut.result(timeout=timeout)
            except BaseException:  # noqa: BLE001 — owner reports it
                pass
