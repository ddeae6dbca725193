"""Streaming deduplication against a static reference corpus.

The streaming shape of operators/dedup.py:cross_near_dup_frames: NEW
documents arrive as a stream (this week's crawl), the REFERENCE corpus
(the training set you already have) is a static frame, and every
micro-batch's near-dups are emitted as they arrive. The entire hot
path is STATELESS per row — shingle hashing, MinHash signatures and
band keys are pure array arithmetic, and candidate generation + exact
verification ride ONE stream-static join (no streaming state beyond
the final pair-dedup guard) — so this runs as append mode at any
input rate, with the static side broadcast/cached once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.dedup import (
    _signatures_from_sets,
    band_structs,
    hashed_shingle_sets,
    shingles,
)


def stream_cross_near_dup_pairs(
    new_stream: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """Verified (id_new, id_ref, jaccard) near-dup pairs of a document
    STREAM against a static reference corpus.

    Plan shape per micro-batch:
    - stream side: hashed shingle set → MinHash signature → band keys,
      all per-row expressions (zero shuffles, zero state); the shingle
      set is CARRIED through the band explode so verification needs no
      second look at the stream (a rejoin of the stream with itself
      would be a stream-stream join and need watermark state);
    - static side (built once, cached): the reference's band frame
      with its ``max_bucket_size`` smallest ids per bucket (the
      cross_near_dup_frames cap — bounded fan-out per band key, same
      truncation semantics) joined to its hashed shingle sets;
    - ONE stream-static inner join on (band_idx, band_hash), exact
      hashed-set Jaccard inline, threshold filter;
    - a streaming dropDuplicates on the pair key: the same pair
      collides in several bands. Unbounded state by design — the key
      space is the emitted-pair set, and jaccard is a pure function of
      the pair so any kept row is THE row. For an infinite stream,
      bound it with a watermark upstream; the finite availableNow runs
      the oracle gate uses need none.

    Batch-equivalence: with an availableNow trigger the emitted set
    equals operators/dedup.py:cross_near_dup_frames on the same
    inputs (q195's oracle is exactly q190's SQL), regardless of how
    many micro-batches the source splits into — per-row expressions
    can't see batch boundaries and the pair-dedup state spans batches.
    """
    rows = num_hashes // bands

    sh = shingles(new_stream, id_col, text_col, shingle_n)
    hs = hashed_shingle_sets(sh, id_col, portable)
    sig = _signatures_from_sets(hs, id_col, num_hashes, portable)
    new_bands = sig.select(
        F.col(id_col).alias("id_new"),
        F.col("hs").alias("hs_n"),
        F.explode(band_structs(bands, rows, portable)).alias("band"),
    ).select("id_new", "hs_n", "band.band_idx", "band.band_hash")

    # static reference lookup: capped band buckets + shingle sets
    ref_sh = shingles(
        ref_df.repartition(F.col(id_col)), id_col, text_col, shingle_n
    )
    ref_hs = hashed_shingle_sets(ref_sh, id_col, portable)
    ref_sig = _signatures_from_sets(ref_hs, id_col, num_hashes, portable)
    ref_bands = ref_sig.select(
        F.col(id_col).alias("id_ref"),
        F.explode(band_structs(bands, rows, portable)).alias("band"),
    ).select("id_ref", "band.band_idx", "band.band_hash")
    capped_ref = (
        ref_bands.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("id_ref")).alias("ids"))
        .select(
            "band_idx",
            "band_hash",
            F.explode(
                F.slice(
                    "ids", 1,
                    F.least(F.lit(max_bucket_size), F.size("ids")).cast("int"),
                )
            ).alias("id_ref"),
        )
        .join(
            ref_hs.select(F.col(id_col).alias("id_ref"), F.col("hs").alias("hs_r")),
            "id_ref",
        )
        .cache()  # static side: materialize once, reused every micro-batch
    )

    inter = F.size(F.array_intersect("hs_n", "hs_r")).cast("long")
    union = (F.size("hs_n") + F.size("hs_r")).cast("long") - inter
    return (
        new_bands.join(capped_ref, ["band_idx", "band_hash"])
        .select(
            "id_new",
            "id_ref",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .dropDuplicates(["id_new", "id_ref"])
    )
