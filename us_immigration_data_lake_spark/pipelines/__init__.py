from us_immigration_data_lake_spark.pipelines.corpus import (
    build_training_corpus,
    CorpusStats,
)
from us_immigration_data_lake_spark.pipelines.immigration import (
    build_demographics,
    build_demographics_state_rollup,
    build_immigration_fact,
    build_arrival_date_dim,
    build_country,
)

__all__ = [
    "build_training_corpus",
    "CorpusStats",
    "build_demographics",
    "build_demographics_state_rollup",
    "build_immigration_fact",
    "build_arrival_date_dim",
    "build_country",
]
