#!/usr/bin/env python3
"""Round-12 slope probe (r11 verdict ask #6 + #3): the two r11
calibration loops that had no SCALE.md rows — ANN recall@k (q221) and
all-pairs hard-negative mining (q230) — plus the r12 additions: the
INDEXED miner (q233, the scale path q230's row motivates) and the
end-to-end training-order pipeline (q234), at 1x/3x/10x rows.

Claims under test:
- ann_recall_at_k with a FIXED query panel (50 queries) is linear in
  corpus rows: the exact side is one broadcast of 50 queries against
  the corpus, the approx side one bucket equi-join.
- hard_negatives (all-pairs) is QUADRATIC in rows by construction —
  measured here at 1x/3x so the 10x cell of the table is a projection,
  not a measurement (the projected ~10 min is exactly why q233
  exists); the probe does not burn that wall-clock.
- hard_negatives_indexed tracks Σ|bucket|² of the SRP layout, not
  |corpus|²: with fixed planes, bucket occupancy grows linearly with
  the corpus, so pair volume grows ~quadratically WITHIN the 64-bucket
  budget but at a constant ~(1+bits)/2^bits fraction of all-pairs —
  the measured slope should sit far below q230's at every scale.
- training_order_pipeline is ~linear: four bounded exchanges, no
  global sort (stage windows are per-(bin, source)).

Usage: python3 scripts/r12_slope_probe.py — prints one JSON line.
Run SOLO (concurrent Spark work measured 11x inflation on an r6
probe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from us_immigration_data_lake_spark.operators.dedup import (  # noqa: E402
    dedup_survivors,
)
from us_immigration_data_lake_spark.operators.sampling import (  # noqa: E402
    training_order_pipeline,
)
from us_immigration_data_lake_spark.operators.similarity import (  # noqa: E402
    ann_recall_at_k,
    hard_negatives,
    hard_negatives_indexed,
    srp_bucket_near_dup_pairs,
)
from us_immigration_data_lake_spark.operators.textstats import (  # noqa: E402
    quality_score,
    text_features,
)
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = {
    "1x": "/root/testdata/sf0.1",
    "3x": os.path.join(REPO, ".localdata", "sf0.3x"),
    "10x": os.path.join(REPO, ".localdata", "sf1.0x"),
}
DIM, BITS, K, THR = 64, 6, 5, 0.35


def _timed_noop(plan, warm: bool = True) -> float:
    if warm:
        plan().write.mode("overwrite").format("noop").save()  # first touch
    t0 = time.perf_counter()
    plan().write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def _record(out, op, label, sec):
    out.setdefault(op, {})[label] = sec
    print(f"[probe] {op} {label} {sec}", file=sys.stderr, flush=True)


def main() -> None:
    spark = get_spark("r12-slope-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for label, d in DIRS.items():
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        # the query panel is FIXED (the sf0.1 ids 0..49 exist at every
        # scale: copies get offset ids), so recall probes corpus growth
        queries = emb.filter(F.col("vec_id") < 50)
        _record(out, "ann_recall_at_k", label, _timed_noop(
            lambda: ann_recall_at_k(
                emb, queries, "vec_id", "embedding", k=K, dim=DIM,
                num_bits=BITS, seed=42,
            )
        ))
        if label != "10x":
            # all-pairs: 4M pairs at 1x, 36M at 3x; the 10x cell
            # (400M pairs) is deliberately NOT run — see module doc.
            # 3x skips the first-touch pass too (the codegen constant
            # is tiny against 36M scored pairs; one run suffices)
            _record(out, "hard_negatives_allpairs", label, _timed_noop(
                lambda: hard_negatives(
                    emb, "vec_id", "embedding", k=K, dim=DIM,
                    dup_threshold=THR,
                ),
                warm=(label == "1x"),
            ))

        def _indexed():
            pairs = srp_bucket_near_dup_pairs(
                emb, "vec_id", "embedding", threshold=THR, dim=DIM,
                num_bits=BITS, seed=42,
            )
            clusters = dedup_survivors(
                emb, pairs.select("id1", "id2"), "vec_id"
            ).select("vec_id", "cluster")
            return hard_negatives_indexed(
                emb, "vec_id", "embedding", clusters, k=K, dim=DIM,
                num_bits=BITS, seed=42, multiprobe=True,
            )

        _record(out, "hard_negatives_indexed", label, _timed_noop(_indexed))

        docs = spark.read.parquet(f"{d}/documents.parquet")

        def _pipeline():
            scored = quality_score(text_features(docs, "doc_id", "text"))
            base = scored.select("doc_id", "n_tokens", "quality_score").join(
                docs.select("doc_id", "source"), "doc_id"
            )
            return training_order_pipeline(
                base, "doc_id", "source", "quality_score", "n_tokens",
                cap=200, alpha=0.3, n_bins=4, epoch=1,
            )

        _record(out, "training_order_pipeline", label, _timed_noop(_pipeline))
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
