from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from us_immigration_data_lake_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = get_spark(
        "tests",
        extra_conf={
            "spark.driver.memory": "6g",
            "spark.sql.warehouse.dir": str(wh),
            # test-only: 8 reducers instead of the engine's 32 — suite
            # inputs are toy-sized and every shuffle stage otherwise
            # schedules 32 near-empty tasks (pure scheduler overhead;
            # the r11 durations profile attributed most suite wall to
            # it). Correctness is partition-count-independent — the
            # driver-mimic sweep runs the full registry under a
            # DEFAULT-conf session (200 partitions) every round.
            "spark.sql.shuffle.partitions": "8",
            # same rationale for RDD-side parallelism: createDataFrame
            # over a handful of local rows otherwise parallelizes into
            # 32 near-empty tasks per action
            "spark.default.parallelism": "8",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
