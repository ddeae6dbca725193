"""Table catalog over a directory of parquet tables.

Generalizes the reference's ad-hoc temp-view registration
(etl.py:313 registers exactly one view). Here every table in a scale
directory is registered so the full Spark SQL dialect is available
(SURVEY.md §2.7), and DataFrame callers get cached handles.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy handles to the parquet tables under one sf directory."""

    def __init__(self, spark: SparkSession, base_dir: str,
                 tables: tuple[str, ...] = TESTDATA_TABLES):
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.tables = tables
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return posixpath.join(self.base_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self.spark.read.parquet(self.path(name))
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, prefix: str = "") -> None:
        """Register every table as a temp view → full SQL surface."""
        for name in self.tables:
            self.table(name).createOrReplaceTempView(f"{prefix}{name}")
