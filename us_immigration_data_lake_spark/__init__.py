"""us_immigration_data_lake_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the capabilities of the
reference data-lake pipeline (ahlag/US-immigration-Data-Lake,
/root/reference/etl.py), generalized into a composable engine library:

- schema-first sources & partitioned parquet sinks  (sources/)
- native column-expression library replacing the reference's four
  row-wise Python UDFs                              (functions/)
- aggregation / pivot / join / window / set-op operators (operators/)
- declarative data-quality checks                   (quality.py)
- structured-streaming slice over event tables      (streaming/)
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash),
  embedding similarity search, text analysis, multimodal plumbing
                                                    (operators/)

Everything is public PySpark 3.x/4.x DataFrame/SQL API; no custom
Catalyst rules are needed (SURVEY.md §4).
"""

from us_immigration_data_lake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
