"""Empty-input sweep: every batch query must run (0 rows is fine)
against a zero-row mirror of the full schema — production tables have
empty partitions and fresh deployments have empty lakes, and an
operator that crashes there (ordinal access on missing first(),
division by a zero count crossing a non-null path, a .first() probe
assuming data) would take a 10-hour job down at hour zero.

Deliberate loud errors are allowed ONLY where documented: an operator
whose OUTPUT is undefined on empty input (pagerank's fixpoint over no
nodes) raises a named ValueError rather than fabricating a result."""

from __future__ import annotations

import pytest

from us_immigration_data_lake_spark.plans.queries import QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# operators whose result is undefined on empty input by contract;
# they must raise a ValueError mentioning 'empty'
EXPECTED_LOUD = {"q122_pagerank_events"}


_SWEEP_FUTURE = None


def _build_empty_mirror(spark, root):
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{root}/{t}.parquet")
    return root


def _sweep(spark, root):
    # thread-pooled (the parity-prefetch idiom): the serial sweep cost
    # 80 s (r9 durations profile); each query's build+count is
    # independent and Spark's scheduler interleaves the jobs
    from concurrent.futures import ThreadPoolExecutor

    _build_empty_mirror(spark, root)

    def check(item):
        name, spec = item
        try:
            spec.fn(spark, root).count()
            return name, None
        except ValueError as e:
            if name in EXPECTED_LOUD and "empty" in str(e):
                return name, None
            return name, f"{type(e).__name__}: {e}"
        except Exception as e:  # noqa: BLE001 — collecting all failures
            return name, f"{type(e).__name__}: {str(e).splitlines()[0][:100]}"

    batch = [
        (n, s) for n, s in QUERIES.items() if "streaming" not in s.tags
    ]
    with ThreadPoolExecutor(max_workers=12) as ex:
        failures = {n: err for n, err in ex.map(check, batch) if err}
    return root, failures


def start_background_sweep(spark, nodeids, executor):
    # launched at collection-finish (conftest hook, r12 verdict ask
    # #6) so the full-registry empty sweep overlaps the parity
    # prefetch, the plan lint and the front of the suite
    global _SWEEP_FUTURE
    if any("test_every_batch_query_survives_empty_tables" in n
           for n in nodeids):
        import tempfile

        root = tempfile.mkdtemp(prefix="empty_sf_")
        _SWEEP_FUTURE = executor.submit(_sweep, spark, root)


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    if _SWEEP_FUTURE is not None:
        return _SWEEP_FUTURE.result(timeout=1800)[0]
    return _build_empty_mirror(
        spark, str(tmp_path_factory.mktemp("empty_sf"))
    )


def test_every_batch_query_survives_empty_tables(spark, empty_sf):
    if _SWEEP_FUTURE is not None:
        failures = _SWEEP_FUTURE.result(timeout=1800)[1]
    else:
        failures = _sweep(spark, empty_sf)[1]
    assert failures == {}, failures


def test_expected_loud_errors_still_loud(spark, empty_sf):
    # if someone 'fixes' pagerank to silently return nothing on an
    # empty graph, this fails: the undefined-fixpoint contract says
    # raise, not fabricate
    for name in EXPECTED_LOUD:
        with pytest.raises(ValueError, match="empty"):
            QUERIES[name].fn(spark, empty_sf).count()
