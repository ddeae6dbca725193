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
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
