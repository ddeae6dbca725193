"""SAS sas7bdat ingestion (SURVEY.md §2.1 S4).

The reference's raw monthly I-94 files are sas7bdat (read in its
notebook with pandas.read_sas — 25 minutes for one month, cell-7).
Spark has no native reader; the two public paths are the
`spark-sas7bdat` package (JVM, scalable) or pandas→createDataFrame
(driver-bound, small files only). Neither library ships in this
container, so both are gated behind import/availability checks with
actionable errors; the parquet path (the reference's own curated form,
sas_data/) is the supported ingestion route here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_sas(spark: SparkSession, path: str, driver_side_limit_mb: int = 256) -> DataFrame:
    """Read a sas7bdat file.

    Tries the spark-sas7bdat data source first (cluster-scalable),
    then pandas.read_sas for small files (driver-side), else raises
    with install instructions.
    """
    try:
        return spark.read.format("com.github.saurfang.sas.spark").load(path)
    except Exception:
        pass
    try:
        import os

        import pandas as pd

        if os.path.getsize(path) > driver_side_limit_mb * 1024 * 1024:
            raise NotImplementedError(
                f"{path} exceeds the {driver_side_limit_mb} MB driver-side "
                "limit; install the spark-sas7bdat package "
                "(--packages saurfang:spark-sas7bdat) for distributed reads"
            )
        return spark.createDataFrame(pd.read_sas(path))
    except ImportError as exc:  # pragma: no cover - pandas is present here
        raise NotImplementedError(
            "no sas7bdat reader available: install spark-sas7bdat "
            "(JVM package) or pandas with sas7bdat support"
        ) from exc
