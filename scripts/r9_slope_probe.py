#!/usr/bin/env python3
"""Round-9 slope probe: the three round-8 operators the r8 verdict left
unmeasured (ask #2), plus the new r9 multinomial trainer.

- q202 multi-pass sorted-neighborhood vs q196's single pass, SAME
  derivation, at 1x/3x/10x rows. Claim under test: the multi-pass cost
  is a CONSTANT ~3x of single-pass at every scale (three range
  exchanges, 3*n*w candidates, one shared verify) — i.e. its SLOPE is
  q196's slope.
- q203 trainer per-round cost at 1x/3x/10x corpora. Claim: the feature
  build (tokenize+hash, cached) is the only corpus-order scan; each GD
  round is one aggregate pass over the cached feature frame, so
  rounds=R costs feature_build + R * round_cost with round_cost linear
  in |feature frame|. Measured as rounds=2 vs rounds=6 at each scale
  (slope of the difference = 4 rounds' marginal cost).
- q204 streaming semantic cross-dedup along the REF axis (new side
  fixed at sf0.1's odd vectors), matching q192's measured r8 curve —
  the streaming twin adds only micro-batch plumbing to the identical
  per-row + stream-static-join plan. Plane widths follow the
  documented num_bits = 8 + log2(ref-scale) rule (8/10/11), the same
  configuration the r8 batch row measured at 1.4x.
- q205 multinomial trainer (K=5) vs q203's binary at 1x: the per-round
  claim is ONE job with a Kx in-row fan-out — so multinomial/binary
  per-round cost should be bounded by ~K, not K jobs' fixed overhead.

Usage: python3 scripts/r9_slope_probe.py [snm|train|stream|multi] ...
Prints one JSON line. Run SOLO (concurrent Spark work measured 11x
inflation on one r6 probe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from us_immigration_data_lake_spark.operators import dedup as dd  # noqa: E402
from us_immigration_data_lake_spark.operators import training as tr  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = {
    "1x": "/root/testdata/sf0.1",
    "3x": os.path.join(REPO, ".localdata", "sf0.3x"),
    "10x": os.path.join(REPO, ".localdata", "sf1.0x"),
}


def _docs(spark, d):
    return spark.read.parquet(os.path.join(d, "documents.parquet")).filter(
        F.col("text").rlike("^[ -~]*$")
    )


def _timed_noop(plan) -> float:
    plan().write.mode("overwrite").format("noop").save()  # first touch
    t0 = time.perf_counter()
    plan().write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def probe_snm(spark) -> dict:
    out: dict[str, dict[str, float]] = {"single": {}, "multi": {}}
    for label, d in DIRS.items():
        docs = _docs(spark, d)
        kw = dict(window=3, key_prefix_len=16, threshold=0.055, shingle_n=2)
        out["single"][label] = _timed_noop(
            lambda: dd.sorted_neighborhood_pairs(docs, "doc_id", "text", **kw)
        )
        spark.catalog.clearCache()
        out["multi"][label] = _timed_noop(
            lambda: dd.multi_pass_sorted_neighborhood_pairs(
                docs, "doc_id", "text", **kw
            )
        )
        spark.catalog.clearCache()
    return out


def probe_train(spark) -> dict:
    out: dict[str, dict[str, float]] = {"r2": {}, "r6": {}}
    for label, d in DIRS.items():
        docs = _docs(spark, d)
        labeled = docs.withColumn(
            "__y", (F.length("text") % 2 == 0).cast("long")
        )
        for rounds, key in ((2, "r2"), (6, "r6")):
            # training is eager (collect per round); time the call
            tr.train_logreg_hashed(
                labeled, "doc_id", "text", "__y",
                num_buckets=512, rounds=rounds,
            )  # first touch (JIT, shuffle files)
            t0 = time.perf_counter()
            tr.train_logreg_hashed(
                labeled, "doc_id", "text", "__y",
                num_buckets=512, rounds=rounds,
            )
            out[key][label] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    return out


def probe_stream(spark) -> dict:
    """q204's plan along the ref axis: fixed new side (sf0.1 odd
    vec_ids as ONE-file-per-micro-batch stream), scaled reference,
    num_bits per the 8+log2(scale) rule (the r8 q192 row's config)."""
    import shutil
    import tempfile

    from us_immigration_data_lake_spark.streaming.dedup import (
        stream_cross_srp_near_dup_pairs,
    )

    bits = {"1x": 8, "3x": 10, "10x": 11}
    new_base = (
        spark.read.parquet(os.path.join(DIRS["1x"], "embeddings.parquet"))
        .filter(F.col("vec_id") % 2 == 1)
    )
    out: dict[str, float] = {}
    for label, d in DIRS.items():
        ref = spark.read.parquet(
            os.path.join(d, "embeddings.parquet")
        ).filter(F.col("vec_id") % 2 == 0)
        src = tempfile.mkdtemp(prefix=f"r9stream_{label}_")
        try:
            # 4 files -> 4 micro-batches under maxFilesPerTrigger=1
            new_base.withColumn(
                "__b", F.pmod(F.col("vec_id"), F.lit(4))
            ).write.partitionBy("__b").mode("overwrite").parquet(src)

            def run() -> None:
                stream = (
                    spark.readStream.schema(new_base.schema)
                    .option("maxFilesPerTrigger", "1")
                    .parquet(src + "/__b=*")
                )
                q = (
                    stream_cross_srp_near_dup_pairs(
                        stream, ref, "vec_id", "embedding",
                        threshold=0.35, dim=64, num_bits=bits[label],
                        max_bucket_size=1000,
                    )
                    .writeStream.format("noop")
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            run()  # first touch
            t0 = time.perf_counter()
            run()
            out[label] = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(src, ignore_errors=True)
            spark.catalog.clearCache()
    return out


def probe_multi(spark) -> dict:
    """q205 vs q203 shape at 1x: multinomial K=5 per-round cost vs
    binary, same corpus, same buckets, rounds=4."""
    docs = _docs(spark, DIRS["1x"])
    labeled = docs.withColumn(
        "__y", F.pmod(F.length("text"), F.lit(5)).cast("long")
    )
    out: dict[str, float] = {}
    for key, fn in (
        ("binary_r4", lambda: tr.train_logreg_hashed(
            labeled.withColumn("__y", (F.col("__y") == 0).cast("long")),
            "doc_id", "text", "__y", num_buckets=256, rounds=4)),
        ("multi_k5_r4", lambda: tr.train_multinomial_logreg_hashed(
            labeled, "doc_id", "text", "__y", num_classes=5,
            num_buckets=256, rounds=4)),
    ):
        fn()  # first touch
        t0 = time.perf_counter()
        fn()
        out[key] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    return out


def main() -> None:
    which = sys.argv[1:] or ["snm", "train", "stream", "multi"]
    spark = get_spark("r9-slope-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    if "snm" in which:
        results["sorted_neighborhood"] = probe_snm(spark)
    if "train" in which:
        results["train_logreg"] = probe_train(spark)
    if "stream" in which:
        results["stream_cross_srp"] = probe_stream(spark)
    if "multi" in which:
        results["multinomial_vs_binary"] = probe_multi(spark)
    if "nb" in which:
        results["naive_bayes"] = probe_nb(spark)
    if "pack" in which:
        results["pack_nextfit"] = probe_pack(spark)
    if "reflm" in which:
        results["ref_lm_xent"] = probe_reflm(spark)
    if "bpe" in which:
        results["bpe_encode"] = probe_bpe_encode(spark)
    if "overlap" in which:
        results["cross_group_overlap"] = probe_overlap(spark)
    if "embinc" in which:
        results["embedding_increment"] = probe_embinc(spark)
    print(json.dumps({"probe": "r9_slopes", "results": results}))




def probe_nb(spark) -> dict:
    """q206 Naive Bayes train+classify at 1x/3x/10x. Claim: one
    aggregation pass trains; scoring is one broadcast-of-model join —
    everything linear in corpus tokens."""
    out: dict[str, float] = {}
    for label, d in DIRS.items():
        docs = _docs(spark, d)
        labeled = docs.withColumn(
            "__y", F.pmod(F.length("text"), F.lit(5)).cast("long")
        )

        def plan():
            model = tr.naive_bayes_model(
                labeled, "doc_id", "text", "__y", num_buckets=256
            )
            return tr.naive_bayes_classify(
                docs, model, "doc_id", "text", num_buckets=256
            )

        out[label] = _timed_noop(plan)
        spark.catalog.clearCache()
    return out


def probe_pack(spark) -> dict:
    """q207 next-fit packing at 1x/3x/10x. Claim: one tokenize pass +
    sharded Arrow packing — linear, shard-parallel."""
    from us_immigration_data_lake_spark.functions.text import token_count
    from us_immigration_data_lake_spark.operators.packing import (
        pack_sequences_nextfit,
    )

    out: dict[str, float] = {}
    for label, d in DIRS.items():
        docs = _docs(spark, d).select(
            "doc_id",
            token_count(F.lower(F.col("text"))).cast("long").alias("n_tok"),
        )
        out[label] = _timed_noop(
            lambda: pack_sequences_nextfit(
                docs, "doc_id", "n_tok", capacity=512, num_shards=32
            )
        )
        spark.catalog.clearCache()
    return out


def probe_reflm(spark) -> dict:
    """q208 reference-LM filter along BOTH axes: (a) both sides scale
    (odd/even split of the scaled fixture), (b) ref fixed at 1x, new
    scaled — the censuses-are-one-time-cost claim."""
    from us_immigration_data_lake_spark.operators.textstats import (
        ref_lm_bigram_xent,
    )

    out: dict[str, dict[str, float]] = {"both": {}, "new_axis": {}}
    ref_1x = _docs(spark, DIRS["1x"]).filter(F.col("doc_id") % 2 == 0)
    for label, d in DIRS.items():
        docs = _docs(spark, d)
        new_side = docs.filter(F.col("doc_id") % 2 == 1)
        out["both"][label] = _timed_noop(
            lambda: ref_lm_bigram_xent(
                new_side, docs.filter(F.col("doc_id") % 2 == 0),
                "doc_id", "text",
            )
        )
        spark.catalog.clearCache()
        out["new_axis"][label] = _timed_noop(
            lambda: ref_lm_bigram_xent(new_side, ref_1x, "doc_id", "text")
        )
        spark.catalog.clearCache()
    return out


def probe_bpe_encode(spark) -> dict:
    """q209 BPE apply at 1x/3x/10x with a FIXED merge table (trained
    once at 1x — the deployment shape: tokenizer trained on a sample,
    applied to the corpus). Claim: vocab-sized folds + one corpus
    join — linear in tokens."""
    from us_immigration_data_lake_spark.operators import textstats as ts

    merges = [
        (r["left"], r["right"])
        for r in ts.bpe_merges(_docs(spark, DIRS["1x"]), "text", n_merges=8)
        .orderBy("rank").collect()
    ]
    out: dict[str, float] = {}
    for label, d in DIRS.items():
        docs = _docs(spark, d)
        out[label] = _timed_noop(
            lambda: ts.bpe_token_counts(docs, "doc_id", "text", merges)
        )
        spark.catalog.clearCache()
    return out


def probe_overlap(spark) -> dict:
    """q211 cross-source overlap at 1x/3x/10x. Claim: one shingle pass
    + one shingle-key self-join with fan-out bounded by source-count^2
    — linear in corpus shingles."""
    from us_immigration_data_lake_spark.operators import dedup as dd2

    out: dict[str, float] = {}
    for label, d in DIRS.items():
        docs = _docs(spark, d)
        out[label] = _timed_noop(
            lambda: dd2.cross_group_overlap(
                docs, "doc_id", "text", "source", shingle_n=3
            )
        )
        spark.catalog.clearCache()
    return out


def probe_embinc(spark) -> dict:
    """q214 embedding increment at 1x/3x/10x (both sides scale,
    odd/even split, production xxhash-free SRP path). Claim: every
    stage is a measured-flat-or-linear parent (q192 cross, q187
    within)."""
    from us_immigration_data_lake_spark.pipelines.corpus import (
        update_embedding_increment,
    )

    out: dict[str, float] = {}
    for label, d in DIRS.items():
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        new_df = emb.filter(F.col("vec_id") % 2 == 1)
        ref_df = emb.filter(F.col("vec_id") % 2 == 0)

        def run():
            final, st = update_embedding_increment(
                new_df, ref_df, "vec_id", "embedding", threshold=0.35,
                dim=64, num_bits=8,
            )
            print(f"# embinc {label}: {st}", file=sys.stderr)

        run()  # first touch
        t0 = time.perf_counter()
        run()
        out[label] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    return out


if __name__ == "__main__":
    main()
