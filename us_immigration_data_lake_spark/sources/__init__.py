from us_immigration_data_lake_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
)
from us_immigration_data_lake_spark.sources.writers import write_parquet
from us_immigration_data_lake_spark.sources.catalog import Catalog, TESTDATA_TABLES

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "write_parquet",
    "Catalog",
    "TESTDATA_TABLES",
]
