"""Multimodal column plumbing (SURVEY.md §2.10).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct; transforms run as Arrow-batched ``mapInPandas``
(the only place Python touches data in this engine — vectorized,
never row-at-a-time).

The actual codec step is STUBBED: image/audio libraries are not in
this container, so ``decode_image`` raises NotImplementedError and
``extract_features`` computes a deterministic fake feature vector from
the raw bytes. Everything around the stub — schema, batch iteration,
partitioning, output shape — is real and tested; swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("content", BinaryType(), True),       # opaque payload
    StructField("meta_format", StringType(), True),   # e.g. png, wav
    StructField("meta_width", LongType(), True),
    StructField("meta_height", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("byte_len", LongType(), False),
    StructField("features", ArrayType(DoubleType()), False),
])


def text_as_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table: utf-8 bytes of the text play the
    opaque payload (real pipelines read image bytes from object
    storage the same way — a binary column is a binary column)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("fake").alias("meta_format"),
        F.lit(None).cast("long").alias("meta_width"),
        F.lit(None).cast("long").alias("meta_height"),
    )


def decode_image(content: bytes):
    """Real decoder would go here (PIL/opencv). Not available in this
    container — plumbing is exercised with extract_features instead."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "swap in PIL.Image.open(io.BytesIO(content)) in production"
    )


def extract_features(media: DataFrame, num_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The fake feature is deterministic (byte-histogram moments), so
    tests can assert exact values; the mapInPandas batch shape, arrow
    transfer, and output schema are the real thing.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = pdf["content"]
            rows = []
            for mid, blob in zip(pdf["media_id"], contents):
                b = bytes(blob) if blob is not None else b""
                n = len(b)
                feats = [
                    float(sum(b[i::num_features]) % 997) / 997.0
                    for i in range(num_features)
                ]
                rows.append((int(mid), n, feats))
            yield pd.DataFrame(rows, columns=["media_id", "byte_len", "features"])

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)
