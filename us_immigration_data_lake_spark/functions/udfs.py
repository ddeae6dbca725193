"""The sanctioned Python-UDF surface, one of each kind (SURVEY.md §2.8:
the reference had only row-wise scalar UDFs, which this engine bans —
these are the Arrow/typed forms Python is allowed to take when native
expressions genuinely can't express the logic).

- scalar: pandas_udf (Arrow-vectorized), here a percent-encoded slug.
- aggregate: pandas_udf GROUPED_AGG, here median absolute deviation
  (no native Spark expression exists).
- table function: Python UDTF (Spark 4), here a text chunk exploder —
  the lateral-view form of operators/textstats.py:chunk_documents.

Each has a test in tests/test_udfs.py; none appear in oracle-compared
queries (native expressions own that surface).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, StringType


@pandas_udf(StringType())
def slugify(s: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: lowercase, non-alnum → '-'."""
    return (
        s.str.lower()
        .str.replace(r"[^a-z0-9]+", "-", regex=True)
        .str.strip("-")
    )


@pandas_udf(DoubleType())
def median_abs_deviation(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: MAD — robust dispersion, no native
    Spark aggregate expresses it. Coerce to float64 first: SQL decimal
    literals (e.g. ``VALUES (1.0)``) arrive as Decimal objects, which
    don't mix with float arithmetic."""
    v = v.astype("float64")
    med = v.median()
    return float((v - med).abs().median())


@udtf(returnType="chunk_idx: int, chunk_text: string")
class ChunkExploder:
    """Python UDTF: explode a text into fixed-token chunks — the
    lateral-view counterpart of chunk_documents for SQL users:
    ``SELECT c.* FROM docs, LATERAL chunk_exploder(text, 50)``."""

    def eval(self, text: str, chunk_tokens: int = 50):
        if text is None:
            return
        toks = text.split()
        for i in range(0, max(len(toks), 1), chunk_tokens):
            yield i // chunk_tokens, " ".join(toks[i : i + chunk_tokens])


def register_udfs(spark) -> None:
    """Make the Python surface available to SQL."""
    spark.udf.register("slugify", slugify)
    spark.udf.register("median_abs_deviation", median_abs_deviation)
    spark.udtf.register("chunk_exploder", ChunkExploder)
