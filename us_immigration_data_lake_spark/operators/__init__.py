from us_immigration_data_lake_spark.operators.aggregate import (
    grouped_agg,
    pivot_agg,
    dedup_exact,
)
from us_immigration_data_lake_spark.operators.joins import (
    dim_join,
    semi_join,
    anti_join,
)
from us_immigration_data_lake_spark.operators.windows import ranked, top_k

__all__ = [
    "grouped_agg",
    "pivot_agg",
    "dedup_exact",
    "dim_join",
    "semi_join",
    "anti_join",
    "ranked",
    "top_k",
]
