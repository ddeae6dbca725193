"""Product quantization: encoder correctness vs numpy argmin, Lloyd
training's error reduction over random codebooks, and IVF-PQ recall
against the exact brute-force ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators.similarity import (
    ivfpq_knn,
    pq_codebooks,
    pq_encode,
    pq_train_codebooks,
)

DIM, N_SUB, K_CODES = 16, 4, 4


def _corpus(spark, n=200, seed=5):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def _np_encode(vecs, books):
    sub = DIM // N_SUB
    out = []
    for _, v in vecs:
        codes = []
        for s, cb in enumerate(books):
            sv = np.array(v[s * sub : (s + 1) * sub])
            # match the engine: argmin over MICRO-UNIT-rounded distances
            d = [round(float(np.sum((sv - np.array(c)) ** 2)) * 1e6) for c in cb]
            codes.append(int(np.argmin(d)))
        out.append(codes)
    return out


def test_encode_matches_numpy_argmin(spark):
    df, rows = _corpus(spark)
    books = pq_codebooks(DIM, N_SUB, K_CODES, seed=3)
    got = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df, "vec_id", "embedding", books).collect()
    }
    want = _np_encode(rows, books)
    assert [got[i] for i in range(len(rows))] == want


def _quant_error(rows, books):
    sub = DIM // N_SUB
    err = 0.0
    for codes, (_, v) in zip(_np_encode(rows, books), rows):
        for s, c in enumerate(codes):
            sv = np.array(v[s * sub : (s + 1) * sub])
            err += float(np.sum((sv - np.array(books[s][c])) ** 2))
    return err


def test_training_reduces_quantization_error(spark):
    df, rows = _corpus(spark, n=300)
    random_books = pq_codebooks(DIM, N_SUB, K_CODES, seed=3)
    trained = pq_train_codebooks(
        df, "vec_id", "embedding", N_SUB, K_CODES, iters=4
    )
    assert _quant_error(rows, trained) < 0.7 * _quant_error(rows, random_books)


def test_training_validates_inputs(spark):
    df, _ = _corpus(spark, n=2)
    with pytest.raises(ValueError, match="k_codes"):
        pq_train_codebooks(df, "vec_id", "embedding", N_SUB, 8)
    df15, _ = _corpus(spark, n=20)
    with pytest.raises(ValueError, match="divisible"):
        pq_train_codebooks(df15, "vec_id", "embedding", 3, 2)


def test_ivfpq_recall_vs_brute_force(spark):
    # Clustered corpus (25 tight gaussian clusters of 10): a query's
    # true neighbors are its cluster mates. On UNclustered gaussians
    # PQ recall is inherently poor (pairwise distances concentrate and
    # quantization noise swamps the margin — the known PQ worst case),
    # so the recall floor is asserted where the structure ANN serves
    # actually exists.
    rng = np.random.RandomState(9)
    centers = rng.randn(25, DIM) * 3.0
    rows = [
        (c * 10 + j, [float(x) for x in centers[c] + 0.05 * rng.randn(DIM)])
        for c in range(25)
        for j in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    coarse = [[float(x) for x in rng.randn(DIM)] for _ in range(3)]
    books = pq_train_codebooks(
        df, "vec_id", "embedding", N_SUB, K_CODES, iters=3
    )
    queries = df.filter(F.col("vec_id") % 50 == 0)
    got = ivfpq_knn(
        df, queries, "vec_id", "embedding", coarse, books, k=5, nprobe=3
    ).collect()
    by_q: dict[int, list[int]] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    # Metric: cluster-mate precision, not exact-rank recall — inside a
    # tight cluster every member quantizes to the SAME codes, so ADC
    # ties and the id tie-break picks an arbitrary 5 of the 9 mates;
    # exact-rank recall is capped at ~5/9 by construction while the
    # search is doing its job perfectly at the resolution PQ has.
    hits = total = 0
    for qid, neigh in by_q.items():
        cluster = qid // 10
        hits += sum(1 for n in neigh if n // 10 == cluster)
        total += len(neigh)
    assert len(by_q) == 5
    assert total == 25
    assert hits / total >= 0.9, (hits, total)


def test_ivfpq_k_bound_and_no_self(spark):
    df, _ = _corpus(spark, n=100)
    coarse = [[0.0] * DIM]  # single cell: no pruning
    books = pq_codebooks(DIM, N_SUB, K_CODES, seed=3)
    out = ivfpq_knn(
        df, df.limit(4), "vec_id", "embedding", coarse, books, k=3, nprobe=1
    ).collect()
    per = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        per.setdefault(r.query_id, []).append((r.adist_c, r.neighbor_id))
    assert all(len(v) == 3 for v in per.values())
    # the k rows returned per query ARE its k smallest ADC distances:
    # no corpus vector outside the result may beat the returned worst
    all_scored = {
        (r.query_id, r.neighbor_id): r.adist_c
        for r in ivfpq_knn(
            df, df.limit(4), "vec_id", "embedding", coarse, books,
            k=10**6, nprobe=1,
        ).collect()
    }
    for qid, rows in per.items():
        worst = max(a for a, _ in rows)
        chosen = {n for _, n in rows}
        for (q2, n2), a2 in all_scored.items():
            if q2 == qid and n2 not in chosen:
                assert a2 >= worst, (qid, n2, a2, worst)
