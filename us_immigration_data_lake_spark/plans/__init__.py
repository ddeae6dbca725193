from us_immigration_data_lake_spark.plans.queries import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
