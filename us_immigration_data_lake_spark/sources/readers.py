"""Schema-first readers.

Generalizes the reference's scans (SURVEY.md §2.1 S1-S5):
- CSV with arbitrary separator/header (etl.py:161 reads `;`-separated
  demographics; etl.py:352,381 read with inferSchema).
- Parquet (etl.py:235,276).

Design rule for 100 TB: always pass an explicit schema. ``inferSchema``
costs an extra scan of the data before the real job starts, and a
schema drift silently changes types mid-pipeline. We accept an explicit
``StructType`` (or DDL string) and only fall back to inference when the
caller asks for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    reader = spark.read.options(header=header, sep=sep, **options)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Parquet scan; optional projection so column pruning reaches the
    reader even when the caller keeps the full DataFrame around."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
