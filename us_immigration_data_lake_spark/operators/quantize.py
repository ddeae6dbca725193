"""Embedding quantization (int8) and exact integer similarity over
quantized vectors (SURVEY.md §2.10 similarity-search extension).

At 100 TB an fp32 embedding column is often THE storage/shuffle cost
(a 1024-dim fp32 vector is 4 KiB/row); symmetric int8 quantization
cuts that 4× with bounded error, and integer dot products make the
scored join both cheaper and bit-deterministic — scores are exact
BIGINTs, so ranking is reproducible across engines and runs, unlike
float dot products whose last ULPs depend on summation order.

Everything is native array expressions (transform/aggregate/zip_with)
— codegen'd, no UDFs, no shuffle until the caller's ranking step.

Quantization rule (per vector, symmetric):
  scale = 127 / max(|x_i|)      (0 when the vector is all-zero)
  q_i   = floor(x_i * scale + 0.5)   — round-half-up, identical in
                                       Spark and DuckDB; |q_i| <= 127
                                       by construction, no clamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.windows import top_k_per_group


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector symmetric int8 quantization.

    Returns (id_col, scale DOUBLE, qvec ARRAY<INT>, sq_norm BIGINT):
    ``scale`` is what a reader multiplies by ``1/scale`` to dequantize;
    ``sq_norm`` is the exact integer squared norm of the quantized
    vector (the reusable half of a cosine denominator).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    with_scale = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(0.0))
        .cast("double")
        .alias("scale"),
    )
    qvec = F.transform(
        F.col("_v"), lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("int")
    )
    quantized = with_scale.select(id_col, "scale", qvec.alias("qvec"))
    sq = F.aggregate(
        F.col("qvec"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long") * x.cast("long"),
    )
    return quantized.withColumn("sq_norm", sq)


def int_dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two int array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    qvec_col: str,
    k: int,
) -> DataFrame:
    """Top-k corpus neighbors per query by exact integer dot product
    over int8-quantized vectors.

    The query set (eval prompts, cluster probes — small by nature) is
    BROADCAST against the corpus: no corpus shuffle for scoring, one
    shuffle on query_id for the per-query top-k. Ties break on
    neighbor id, so the k-set is fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(qvec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(qvec_col).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        int_dot(F.col("_qv"), F.col("_cv")).alias("score"),
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.desc("score"), F.asc("neighbor_id")],
        k,
        rank_col="rn",
    ).withColumn("rn", F.col("rn").cast("long"))
