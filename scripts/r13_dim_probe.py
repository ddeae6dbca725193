#!/usr/bin/env python3
"""Round-13 high-dimension probe (r12 verdict ask #2): every
embedding measurement through r12 ran at the fixture's dim 64; real
embedding corpora are 768-4096-dim. This measures the dim-64 vs
dim-768 regime on cosine-preserving fixtures (make_scaled_fixture.py
--dim: identical pair/candidate structure, only per-dimension
arithmetic scales) and prices the q233 inline-vs-checkpoint trade
where it actually flips.

Facts the probe rests on (measured before writing it, cold sessions):
- the UNROLLED dot/cosine form does not exist at dim 768 — a
  left-associative 768-term chain StackOverflows the Catalyst
  analyzer in a cold session (dim 384 analyzes, dim 512 dies; the
  boundary moves with JIT state, hence UNROLL_MAX_DIM = 256 with
  margin). So at dim 768 the contest is inline-HOF vs
  checkpoint+norms, not inline-unrolled vs checkpoint.
- both forms fold left-to-right from 0.0, so values are bitwise-equal
  and the A/B is purely about cost.

Operators measured per (dim, fixture):
- cosine_knn           (q22 substrate: exact brute-force top-k)
- srp_lsh_knn          (q24 substrate: bucketed ANN)
- srp_bucket_pairs     (q181/q187 substrate: semantic dedup pairs)
- hn_indexed           (q233 as shipped: dispatches on UNROLL_MAX_DIM)
- hn_inline_hof        (q233 inline shape, HOF cosine forced — the
                        alternative the dispatch rejects at high dim)

Usage: python3 scripts/r13_dim_probe.py — prints one JSON line.
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
from pyspark.sql.window import Window  # noqa: E402

from us_immigration_data_lake_spark.operators import (  # noqa: E402
    similarity as sim,
)
from us_immigration_data_lake_spark.operators.dedup import (  # noqa: E402
    dedup_survivors,
)
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = {
    ("d64", "1x"): "/root/testdata/sf0.1",
    ("d64", "10x"): os.path.join(REPO, ".localdata", "sf1.0x"),
    ("d768", "1x"): os.path.join(REPO, ".localdata", "sf0.1_d768"),
    ("d768", "10x"): os.path.join(REPO, ".localdata", "sf1.0x_d768"),
}
DIM = {"d64": 64, "d768": 768}
K, THR = 5, 0.35
# occupancy-held bits per scale (recommended_num_bits: 2k->6, 20k->10
# at the mining occupancy target)
BITS = {"1x": 6, "10x": 10}


def _timed_noop(plan, warm: bool = True) -> float:
    if warm:
        plan().write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    plan().write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def _record(out, op, label, sec):
    out.setdefault(op, {})[label] = sec
    print(f"[probe] {op} {label} {sec}", file=sys.stderr, flush=True)


def hn_inline_hof(df, id_col, vec_col, clusters, *, k, dim, num_bits, seed):
    """q233's INLINE shape with the HOF cosine — the only inline form
    that exists at dim 768 (the unrolled one StackOverflows). Local to
    the probe: this is the variant the shipped dispatch REJECTS at
    high dim; it exists here so the rejection is measured, not
    assumed."""
    planes = sim.srp_planes(dim, num_bits, seed)
    base = (
        df.select(F.col(id_col).alias("__id"),
                  sim._as_double(vec_col).alias("__v"))
        .withColumn("bucket", sim.srp_signature("__v", planes))
        .join(clusters.select(F.col(id_col).alias("__id"), "cluster"),
              "__id", "left")
        .withColumn("cluster", F.coalesce("cluster", F.col("__id")))
    )
    q = base.select(
        F.col("__id").alias("query_id"), F.col("__v").alias("qv"),
        F.col("cluster").alias("q_cluster"), "bucket",
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
          for i in range(num_bits)],
    )
    q = q.withColumn("bucket", F.explode(probes))
    c = base.select(
        F.col("__id").alias("neighbor_id"), F.col("__v").alias("cv"),
        F.col("cluster").alias("c_cluster"), "bucket",
    )
    hof_cos = F.expr(sim._dot_hof_sql("qv", "cv")) / (
        F.sqrt(F.expr(sim._dot_hof_sql("qv", "qv")))
        * F.sqrt(F.expr(sim._dot_hof_sql("cv", "cv")))
    )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(F.col("q_cluster") != F.col("c_cluster"))
        .select("query_id", "neighbor_id",
                F.round(hof_cos, 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= k)
    )


def main() -> None:
    spark = get_spark("r13-dim-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for (dlab, slab), d in FIXTURES.items():
        dim, bits = DIM[dlab], BITS[slab]
        label = f"{dlab}_{slab}"
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 50)

        _record(out, "cosine_knn", label, _timed_noop(
            lambda: sim.cosine_knn(emb, queries, "vec_id", "embedding",
                                   k=K, dim=dim)
        ))
        _record(out, "srp_lsh_knn", label, _timed_noop(
            lambda: sim.srp_lsh_knn(emb, queries, "vec_id", "embedding",
                                    k=K, dim=dim, num_bits=bits, seed=42)
        ))
        _record(out, "srp_bucket_pairs", label, _timed_noop(
            lambda: sim.srp_bucket_near_dup_pairs(
                emb, "vec_id", "embedding", threshold=THR, dim=dim,
                num_bits=bits, seed=42)
        ))

        pairs = sim.srp_bucket_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=THR, dim=dim,
            num_bits=bits, seed=42,
        )
        clusters = dedup_survivors(
            emb, pairs.select("id1", "id2"), "vec_id"
        ).select("vec_id", "cluster").localCheckpoint(eager=True)

        _record(out, "hn_indexed", label, _timed_noop(
            lambda: sim.hard_negatives_indexed(
                emb, "vec_id", "embedding", clusters, k=K, dim=dim,
                num_bits=bits, seed=42, multiprobe=True)
        ))
        if dim > sim.UNROLL_MAX_DIM:
            _record(out, "hn_inline_hof", label, _timed_noop(
                lambda: hn_inline_hof(
                    emb, "vec_id", "embedding", clusters, k=K, dim=dim,
                    num_bits=bits, seed=42)
            ))
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
