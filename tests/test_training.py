"""In-engine logistic-regression training (operators/training.py):
bit-exact differential test vs a pure-Python replay, learnability on a
planted signal, and the documented lr-decay necessity."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.operators import training as tr


def _md5_long(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)


def _py_train(rows, num_buckets, rounds, lr_den, decay):
    """Pure-Python replay of train_logreg_hashed's exact fixed-point
    spec — independent implementation, no Spark."""
    docs = []
    for _id, text, y in rows:
        if text is None:
            continue
        toks = [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.strip().lower()) if t]
        f = Counter(_md5_long(t) % num_buckets for t in toks)
        f[-1] = 1
        docs.append((y, dict(f)))
    n = len(docs)
    w: dict[int, int] = {}
    for r in range(rounds):
        m = lr_den * 4 * n * ((r + 1) if decay else 1)
        g: dict[int, int] = {}
        for y, f in docs:
            z = sum(w.get(b, 0) * c for b, c in f.items())
            p = min(4_000_000, max(0, z + 2_000_000))
            e = 4_000_000 * y - p
            for b, c in f.items():
                g[b] = g.get(b, 0) + e * c
        for b, gv in g.items():
            w[b] = w.get(b, 0) + gv // m  # python // is floor division
    return w


FIXTURE = [
    (0, "hash hash join table scan", 1),
    (1, "join join hash merge sort", 0),
    (2, "hash vector hash agg", 1),
    (3, "table scan filter row", 0),
    (4, "hash table hash join hash", 1),
    (5, None, 1),  # NULL text: excluded from training entirely
    (6, "join stream window", 0),
    (7, "", 0),  # empty text: bias-only row
    (8, "hash", 1),
    (9, "merge join batch join", 0),
]


@pytest.mark.parametrize("rounds,lr_den,decay", [(1, 1, True), (5, 1, True), (3, 2, False)])
def test_train_logreg_matches_python_exactly(spark, rounds, lr_den, decay):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string, y long")
    got = {
        r.bucket: r.w_pm
        for r in tr.train_logreg_hashed(
            df, "doc_id", "text", "y", num_buckets=64,
            rounds=rounds, lr_den=lr_den, decay=decay,
        ).collect()
    }
    want = _py_train(FIXTURE, 64, rounds, lr_den, decay)
    assert got == want  # bit-exact: every weight, every bucket, the bias


def test_train_logreg_learns_planted_signal(spark):
    """y = 1 iff the doc contains 'positron': after training, the
    weight on hash('positron')'s bucket dominates, and the trained
    scorer separates the classes on the training set."""
    rows = []
    for i in range(40):
        filler = f"alpha beta gamma delta w{i % 7}"
        if i % 2 == 0:
            rows.append((i, filler + " positron", 1))
        else:
            rows.append((i, filler + " electron", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    B = 128
    w = {
        r.bucket: r.w_pm
        for r in tr.train_logreg_hashed(
            df, "doc_id", "text", "y", num_buckets=B, rounds=8,
        ).collect()
    }
    pos_b = _md5_long("positron") % B
    neg_b = _md5_long("electron") % B
    assert w[pos_b] > 0 > w[neg_b]
    assert w[pos_b] == max(w.values())
    # the trained model classifies the training set perfectly
    for i, text, y in rows:
        toks = text.split()
        z = w[-1] + sum(
            w.get(_md5_long(t) % B, 0) * c for t, c in Counter(toks).items()
        )
        assert (z >= 0) == (y == 1), (i, z, y)


def test_lr_decay_converges_where_fixed_step_oscillates(spark):
    """The hard sigmoid's gradient has constant slope, so a FIXED step
    overshoots and oscillates early (measured on the sf0.01 corpus:
    accuracies 314, 186, 314, 470, 475, 370, 314, 188 — no
    convergence); the 1/(r+1) Robbins-Monro decay is load-bearing.
    Pinned on a comparative-count fixture (y = cnt(hash) > cnt(join)):
    after 3 rounds the decayed run classifies the training set
    perfectly, the fixed-step run (same lr_den) does not."""
    rows = []
    i = 0
    for a in range(5):
        for b in range(5):
            text = " ".join(["hash"] * a + ["join"] * b + ["alpha", "beta", f"f{i % 3}"])
            rows.append((i, text, 1 if a > b else 0))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    B = 64

    def accuracy(weights):
        ok = 0
        for _i, text, y in rows:
            z = sum(
                weights.get(_md5_long(t) % B, 0) * c
                for t, c in Counter(text.split()).items()
            ) + weights.get(-1, 0)
            ok += (z >= 0) == (y == 1)
        return ok

    w_decay = {
        r.bucket: r.w_pm
        for r in tr.train_logreg_hashed(
            df, "doc_id", "text", "y", num_buckets=B, rounds=3, decay=True
        ).collect()
    }
    w_fixed = {
        r.bucket: r.w_pm
        for r in tr.train_logreg_hashed(
            df, "doc_id", "text", "y", num_buckets=B, rounds=3, decay=False
        ).collect()
    }
    assert accuracy(w_decay) == len(rows)
    assert accuracy(w_fixed) < len(rows)


def test_training_releases_caches(spark):
    # clearCache() is session-GLOBAL: join the background registry
    # sweeps first or this evicts their caches mid-flight (values stay
    # correct via recompute, but the suite pays the latency — r13
    # advisor)
    from tests.conftest import wait_for_background_sweeps

    wait_for_background_sweeps()
    spark.catalog.clearCache()
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string, y long")
    tr.train_logreg_hashed(df, "doc_id", "text", "y", num_buckets=32, rounds=2)
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "train_logreg_hashed leaked a cache entry"


def test_training_releases_checkpoint_storage(spark):
    """The r13 localCheckpoint swap must not trade the cache leak for
    a storage leak: checkpointed MEMORY_AND_DISK blocks are reaped
    only on driver GC unless released, so repeated trainer calls in a
    long session accumulate (r13 advisor). Both trainers now
    unpersist their checkpointed frames in a finally — the persisted-
    RDD count must come back to where it started."""
    from tests.conftest import wait_for_background_sweeps

    wait_for_background_sweeps()
    sc = spark.sparkContext

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    df = spark.createDataFrame(FIXTURE, "doc_id long, text string, y long")
    mdf = spark.createDataFrame(
        MULTI_FIXTURE, "doc_id long, text string, y long"
    )
    before = n_persisted()
    tr.train_logreg_hashed(df, "doc_id", "text", "y", num_buckets=32, rounds=2)
    tr.train_multinomial_logreg_hashed(
        mdf, "doc_id", "text", "y", num_classes=3, num_buckets=32, rounds=2
    )
    assert n_persisted() <= before, "trainer leaked checkpoint storage"


def test_train_logreg_ignores_null_labels(spark):
    """r8 advisor: a NULL label must remove the doc from the training
    set entirely (n AND gradient), not silently shrink updates by
    counting in n while its NULL error term drops out of F.sum."""
    with_nulls = FIXTURE + [(100, "noise text rows", None),
                            (101, "more unlabeled noise", None)]
    df = spark.createDataFrame(
        with_nulls, "doc_id long, text string, y long"
    )
    clean = spark.createDataFrame(FIXTURE, "doc_id long, text string, y long")
    kw = dict(num_buckets=64, rounds=3)
    got = {r.bucket: r.w_pm
           for r in tr.train_logreg_hashed(df, "doc_id", "text", "y", **kw).collect()}
    want = {r.bucket: r.w_pm
            for r in tr.train_logreg_hashed(clean, "doc_id", "text", "y", **kw).collect()}
    assert got == want  # unlabeled rows contribute nothing at all


# ---------------------------------------------------------------------------
# r9: multinomial (one-vs-rest) trainer — same exact fixed-point spec,
# K independent hard-sigmoid heads over the shared hashed features.
# ---------------------------------------------------------------------------


def _py_train_multi(rows, num_classes, num_buckets, rounds, lr_den, decay):
    """Pure-Python replay of train_multinomial_logreg_hashed —
    independent implementation, no Spark."""
    docs = []
    for _id, text, y in rows:
        if text is None or y is None:
            continue
        toks = [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.strip().lower()) if t]
        f = Counter(_md5_long(t) % num_buckets for t in toks)
        f[-1] = 1
        docs.append((y, dict(f)))
    n = len(docs)
    w: dict[tuple[int, int], int] = {}
    for r in range(rounds):
        m = lr_den * 4 * n * ((r + 1) if decay else 1)
        g: dict[tuple[int, int], int] = {}
        for y, f in docs:
            for k in range(num_classes):
                z = sum(w.get((k, b), 0) * c for b, c in f.items())
                p = min(4_000_000, max(0, z + 2_000_000))
                e = 4_000_000 * (1 if y == k else 0) - p
                for b, c in f.items():
                    g[(k, b)] = g.get((k, b), 0) + e * c
        for key, gv in g.items():
            w[key] = w.get(key, 0) + gv // m
    return w


MULTI_FIXTURE = [
    (0, "hash hash join table scan", 0),
    (1, "join join hash merge sort", 1),
    (2, "hash vector hash agg", 0),
    (3, "table scan filter row", 2),
    (4, "hash table hash join hash", 0),
    (5, None, 1),       # NULL text: excluded entirely
    (6, "join stream window", 1),
    (7, "", 2),         # empty text: bias-only row
    (8, "hash", 0),
    (9, "merge join batch join", 1),
    (10, "filter row scan scan", 2),
    (11, "window filter stream", None),  # NULL label: excluded entirely
]


@pytest.mark.parametrize("rounds,lr_den,decay", [(1, 1, True), (4, 1, True), (3, 2, False)])
def test_train_multinomial_matches_python_exactly(spark, rounds, lr_den, decay):
    df = spark.createDataFrame(MULTI_FIXTURE, "doc_id long, text string, y long")
    got = {
        (r["class"], r.bucket): r.w_pm
        for r in tr.train_multinomial_logreg_hashed(
            df, "doc_id", "text", "y", num_classes=3, num_buckets=64,
            rounds=rounds, lr_den=lr_den, decay=decay,
        ).collect()
    }
    want = _py_train_multi(MULTI_FIXTURE, 3, 64, rounds, lr_den, decay)
    assert got == want


def test_train_multinomial_learns_planted_signal(spark):
    """Three classes with disjoint marker vocabularies: after training,
    argmax over the per-class scores must recover every class."""
    markers = {0: "alpha", 1: "bravo", 2: "charlie"}
    rows = []
    for i in range(60):
        k = i % 3
        filler = f"common word{i % 5} noise"
        rows.append((i, f"{markers[k]} {filler} {markers[k]}", k))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    w = {
        (r["class"], r.bucket): r.w_pm
        for r in tr.train_multinomial_logreg_hashed(
            df, "doc_id", "text", "y", num_classes=3, num_buckets=128,
            rounds=6,
        ).collect()
    }

    def score(text, k):
        toks = [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.strip().lower()) if t]
        f = Counter(_md5_long(t) % 128 for t in toks)
        f[-1] = 1
        return sum(w.get((k, b), 0) * c for b, c in f.items())

    for k, mk in markers.items():
        text = f"{mk} common word1 noise {mk}"
        scores = [score(text, j) for j in range(3)]
        assert max(range(3), key=lambda j: scores[j]) == k


def test_train_multinomial_releases_caches(spark):
    from tests.conftest import wait_for_background_sweeps

    wait_for_background_sweeps()  # clearCache is session-global
    df = spark.createDataFrame(MULTI_FIXTURE, "doc_id long, text string, y long")
    spark.catalog.clearCache()
    tr.train_multinomial_logreg_hashed(
        df, "doc_id", "text", "y", num_classes=3, num_buckets=32, rounds=2
    )
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "train_multinomial_logreg_hashed leaked a cache entry"


# ---------------------------------------------------------------------------
# r9: closed-form multinomial Naive Bayes (micronat log-space).
# ---------------------------------------------------------------------------


def _py_nb(rows, num_buckets):
    """Pure-Python replay of naive_bayes_model + naive_bayes_classify."""
    import math

    def toks_of(text):
        return [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.strip().lower()) if t]

    def feats_of(text):
        return Counter(_md5_long(t) % num_buckets for t in toks_of(text))

    labeled = [(i, text, y) for i, text, y in rows
               if text is not None and y is not None]
    n = len(labeled)
    kb, tot, nk = {}, {}, {}
    for _i, text, y in labeled:
        nk[y] = nk.get(y, 0) + 1
        for b, c in feats_of(text).items():
            kb[(y, b)] = kb.get((y, b), 0) + c
            tot[y] = tot.get(y, 0) + c
    B = num_buckets
    w = {key: round(math.log((c + 1) / (tot[key[0]] + B)) * 1e6)
         for key, c in kb.items()}
    classes = {
        k: (round(math.log(nk[k] / n) * 1e6),
            round(math.log(1 / (tot.get(k, 0) + B)) * 1e6))
        for k in nk
    }
    preds = {}
    for i, text, _y in rows:
        if text is None:
            continue
        f = feats_of(text)
        t_d = sum(f.values())
        best = None
        for k, (prior, default) in sorted(classes.items()):
            s = prior + t_d * default + sum(
                c * (w[(k, b)] - default) for b, c in f.items() if (k, b) in w
            )
            if best is None or s > best[1]:
                best = (k, s)
        preds[i] = best
    return w, classes, preds


def test_naive_bayes_matches_python_exactly(spark):
    df = spark.createDataFrame(MULTI_FIXTURE, "doc_id long, text string, y long")
    model = tr.naive_bayes_model(df, "doc_id", "text", "y", num_buckets=64)
    got_w = {(r["class"], r.bucket): r.w_micro
             for r in model["weights"].collect()}
    got_c = {r["class"]: (r.prior_micro, r.default_micro)
             for r in model["classes"].collect()}
    want_w, want_c, want_preds = _py_nb(MULTI_FIXTURE, 64)
    assert got_w == want_w
    assert got_c == want_c
    got_preds = {
        r.doc_id: (r.pred_class, r.score_micro)
        for r in tr.naive_bayes_classify(
            df, model, "doc_id", "text", num_buckets=64
        ).collect()
    }
    assert got_preds == want_preds
    # empty-text doc 7 predicted from priors alone (class 1 is the
    # most frequent label in MULTI_FIXTURE)
    assert 7 in got_preds


def test_naive_bayes_learns_planted_signal(spark):
    markers = {0: "alpha", 1: "bravo", 2: "charlie"}
    rows = []
    for i in range(60):
        k = i % 3
        rows.append((i, f"{markers[k]} common word{i % 5} {markers[k]}", k))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    model = tr.naive_bayes_model(df, "doc_id", "text", "y", num_buckets=128)
    preds = {
        r.doc_id: r.pred_class
        for r in tr.naive_bayes_classify(
            df, model, "doc_id", "text", num_buckets=128
        ).collect()
    }
    assert all(preds[i] == i % 3 for i in range(60))


def test_naive_bayes_never_predicts_unseen_class(spark):
    df = spark.createDataFrame(
        [(0, "alpha alpha", 7), (1, "bravo bravo", 9)],
        "doc_id long, text string, y long",
    )
    model = tr.naive_bayes_model(df, "doc_id", "text", "y", num_buckets=32)
    preds = {r.doc_id: r.pred_class for r in tr.naive_bayes_classify(
        df, model, "doc_id", "text", num_buckets=32
    ).collect()}
    assert set(preds.values()) <= {7, 9}
    assert preds[0] == 7 and preds[1] == 9


def test_nb_rowwise_matches_batch_classify(spark):
    """The compiled per-row scorer must agree with the join-based batch
    classifier exactly — same argmax, same scores, same tie-breaks."""
    df = spark.createDataFrame(MULTI_FIXTURE, "doc_id long, text string, y long")
    model = tr.naive_bayes_model(df, "doc_id", "text", "y", num_buckets=64)
    batch = {
        r.doc_id: (r.pred_class, r.score_micro)
        for r in tr.naive_bayes_classify(
            df, model, "doc_id", "text", num_buckets=64
        ).collect()
    }
    roww = {
        r.doc_id: (r.pred_class, r.score_micro)
        for r in tr.naive_bayes_classify_rowwise(
            df, model, "doc_id", "text", num_buckets=64
        ).collect()
    }
    assert roww == batch


def test_nb_rowwise_is_stateless_per_row(spark):
    """The row-wise scorer's plan must contain no join, no aggregate,
    no exchange — the property that makes it stream-safe."""
    df = spark.createDataFrame(MULTI_FIXTURE, "doc_id long, text string, y long")
    model = tr.naive_bayes_model(df, "doc_id", "text", "y", num_buckets=32)
    plan = tr.naive_bayes_classify_rowwise(
        df, model, "doc_id", "text", num_buckets=32
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan


# ---------------------------------------------------------------------------
# r9: exact ROC-AUC evaluation (roc_auc_exact).
# ---------------------------------------------------------------------------


def _py_auc(pairs):
    """Brute-force pairwise AUC: auc_num = 2*#(pos>neg) + #(pos==neg),
    auc_den = 2*n_pos*n_neg — an INDEPENDENT formulation (the operator
    uses rank sums)."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    gt = sum(1 for p in pos for n in neg if p > n)
    eq = sum(1 for p in pos for n in neg if p == n)
    return len(pos), len(neg), 2 * gt + eq, 2 * len(pos) * len(neg)


@pytest.mark.parametrize("data", [
    [(1, 10), (1, 8), (0, 5), (0, 3)],                      # separable
    [(1, 5), (0, 5), (1, 5), (0, 7), (1, 2)],               # heavy ties
    [(1, 1), (0, 2), (1, 3), (0, 4), (1, 5), (0, 6)],       # interleaved
    [(0, -3), (1, -1), (0, -1), (1, 0), (0, 2), (1, 2)],    # negatives+ties
])
def test_roc_auc_matches_bruteforce(spark, data):
    df = spark.createDataFrame(data, "y long, s long")
    r = tr.roc_auc_exact(df, "y", "s").collect()[0]
    np_, nn, num, den = _py_auc(data)
    assert (r.n_pos, r.n_neg, r.auc_num, r.auc_den) == (np_, nn, num, den)
    assert abs(r.auc - num / den) < 5e-7  # auc is round(·, 6)


def test_roc_auc_perfect_and_random(spark):
    perfect = [(1, 100 + i) for i in range(20)] + [(0, i) for i in range(20)]
    df = spark.createDataFrame(perfect, "y long, s long")
    assert tr.roc_auc_exact(df, "y", "s").collect()[0].auc == 1.0
    all_tied = [(1, 7)] * 10 + [(0, 7)] * 10
    df2 = spark.createDataFrame(all_tied, "y long, s long")
    assert tr.roc_auc_exact(df2, "y", "s").collect()[0].auc == 0.5


def test_roc_auc_degenerate_raises(spark):
    df = spark.createDataFrame([(1, 3), (1, 5)], "y long, s long")
    with pytest.raises(Exception, match="at least one positive AND"):
        tr.roc_auc_exact(df, "y", "s").collect()


def test_auc_of_trained_head_on_planted_signal(spark):
    """train → score → evaluate end-to-end: a marker-vocabulary head
    must reach AUC ≈ 1.0 on held-out docs with the same markers."""
    rows = []
    for i in range(80):
        k = (i // 2) % 2  # decorrelated from the train/test parity split
        word = "alpha" if k == 0 else "bravo"
        rows.append((i, f"{word} filler{i % 7} {word}", k))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    train = df.filter("doc_id % 2 = 0")
    test = df.filter("doc_id % 2 = 1")
    model = tr.naive_bayes_model(train, "doc_id", "text", "y", num_buckets=64)
    scored = (
        tr.naive_bayes_scores(test, model, "doc_id", "text", num_buckets=64)
        .filter("class = 0")
        .join(test.select("doc_id", (F.col("y") == 0).cast("long").alias("lbl")),
              "doc_id")
    )
    r = tr.roc_auc_exact(scored, "lbl", "score_micro").collect()[0]
    assert r.auc >= 0.99


# ---------------------------------------------------------------------------
# r11: exact average precision (pr_auc_exact) + calibration bins
# (calibration_bins) — the rest of the evaluation family (r9 ask #6).
# ---------------------------------------------------------------------------


def _py_ap(pairs):
    """Independent AP replay: iterate DISTINCT scores descending with
    cumulative tp/rank, per-step precision integer-ized to micro
    exactly as the operator contract states."""
    from collections import Counter

    n_pos = sum(1 for y, _ in pairs if y == 1)
    cnt = Counter(s for _, s in pairs)
    pos = Counter(s for y, s in pairs if y == 1)
    tp = rank = 0
    ap_micro = 0
    for v in sorted(cnt, reverse=True):
        tp += pos[v]
        rank += cnt[v]
        # round-half-away-from-zero, the Spark/DuckDB ROUND semantics
        x = 1e6 * tp / rank
        ap_micro += pos[v] * int(x + 0.5)
    return n_pos, ap_micro


@pytest.mark.parametrize("data", [
    [(1, 10), (1, 8), (0, 5), (0, 3)],                      # separable
    [(1, 5), (0, 5), (1, 5), (0, 7), (1, 2)],               # heavy ties
    [(1, 1), (0, 2), (1, 3), (0, 4), (1, 5), (0, 6)],       # interleaved
    [(0, -3), (1, -1), (0, -1), (1, 0), (0, 2), (1, 2)],    # negatives+ties
    [(1, 4), (1, 9)],                                       # all positive
])
def test_pr_auc_matches_python_exactly(spark, data):
    df = spark.createDataFrame(data, "y long, s long")
    r = tr.pr_auc_exact(df, "y", "s").collect()[0]
    n_pos, ap_micro = _py_ap(data)
    assert (r.n_pos, r.ap_micro) == (n_pos, ap_micro)
    assert abs(r.ap - ap_micro / (1e6 * n_pos)) < 5e-7


def test_pr_auc_perfect_is_one_and_no_positives_raises(spark):
    perfect = [(1, 100 + i) for i in range(10)] + [(0, i) for i in range(10)]
    df = spark.createDataFrame(perfect, "y long, s long")
    assert tr.pr_auc_exact(df, "y", "s").collect()[0].ap == 1.0
    neg_only = spark.createDataFrame([(0, 3), (0, 5)], "y long, s long")
    with pytest.raises(Exception, match="at least one positive"):
        tr.pr_auc_exact(neg_only, "y", "s").collect()


def test_pr_auc_ranks_imbalanced_heads_auc_cannot_separate(spark):
    """The metric's reason to exist: two heads with the SAME ROC-AUC
    on a 1:20 imbalance but different false-positive placement get
    DIFFERENT AP — the early-precision head wins."""
    # head A: the positive outranks all negatives but one
    a = [(1, 100)] + [(0, 101)] + [(0, i) for i in range(20)]
    # head B: the positive sits above only half the negatives
    b = [(1, 10)] + [(0, i) for i in range(20)]  # 10 negatives above it
    df_a = spark.createDataFrame(a, "y long, s long")
    df_b = spark.createDataFrame(b, "y long, s long")
    ap_a = tr.pr_auc_exact(df_a, "y", "s").collect()[0].ap
    ap_b = tr.pr_auc_exact(df_b, "y", "s").collect()[0].ap
    assert ap_a > ap_b


def test_calibration_bins_counts_and_fixed_axis(spark):
    rows = [
        # bin 0: [0, 10): two rows, one positive
        (1, 2), (0, 7),
        # bin 1: [10, 20): one negative
        (0, 15),
        # below lo clamps into bin 0; above hi clamps into bin 3
        (1, -99), (1, 999),
    ]
    df = spark.createDataFrame(rows, "y long, s long")
    out = tr.calibration_bins(df, "y", "s", lo=0, width=10, n_bins=4).collect()
    assert [r.bin for r in out] == [0, 1, 2, 3]          # densified axis
    assert [r.bin_lo for r in out] == [0, 10, 20, 30]
    b0, b1, b2, b3 = out
    assert (b0.n, b0.n_pos, b0.sum_score) == (3, 2, 2 + 7 - 99)
    assert (b1.n, b1.n_pos) == (1, 0)
    assert (b2.n, b2.n_pos, b2.mean_score, b2.pos_rate) == (0, 0, None, None)
    assert (b3.n, b3.n_pos, b3.sum_score) == (1, 1, 999)
    assert b0.mean_score == round((2 + 7 - 99) / 3, 6)
    assert b0.pos_rate == round(2 / 3, 6)


def test_calibration_bins_reliability_on_planted_head(spark):
    """A score that IS the log-odds of the label must produce bins
    whose empirical rate increases with the bin index (monotone
    reliability) — and a constant-score head lands in one bin."""
    import math as m

    rng = __import__("random").Random(7)
    rows = []
    for _ in range(4000):
        lo_nat = rng.uniform(-4, 4)
        p = 1 / (1 + m.exp(-lo_nat))
        y = 1 if rng.random() < p else 0
        rows.append((y, int(lo_nat * 1_000_000)))
    df = spark.createDataFrame(rows, "y long, s long")
    out = [
        r for r in tr.calibration_bins(
            df, "y", "s", lo=-4_000_000, width=1_000_000, n_bins=8
        ).collect()
        if r.n >= 50
    ]
    rates = [r.pos_rate for r in out]
    assert all(b > a - 0.08 for a, b in zip(rates, rates[1:]))  # monotone-ish
    assert rates[0] < 0.25 and rates[-1] > 0.75


def test_classification_report_matches_python(spark):
    data = [  # (truth, pred) incl. a class never predicted (3) and
              # one never true (4)
        (0, 0), (0, 0), (0, 1), (1, 1), (1, 0), (1, 1), (2, 2),
        (3, 0), (3, 4),
    ]
    df = spark.createDataFrame(data, "y long, p long")
    rows = {r["class"]: r for r in tr.classification_report(df, "y", "p").collect()}
    from collections import Counter

    n_true = Counter(y for y, _ in data)
    n_pred = Counter(p for _, p in data)
    tp = Counter(y for y, p in data if y == p)
    assert sorted(rows) == sorted(set(n_true) | set(n_pred))
    for k, r in rows.items():
        assert (r.n_true, r.n_pred, r.tp) == (n_true[k], n_pred[k], tp[k])
        assert r.precision == (round(tp[k] / n_pred[k], 6) if n_pred[k] else None)
        assert r.recall == (round(tp[k] / n_true[k], 6) if n_true[k] else None)
        assert r.f1 == round(2 * tp[k] / (n_true[k] + n_pred[k]), 6)
    # class 3: never predicted -> precision NULL, recall 0
    assert rows[3].precision is None and rows[3].recall == 0.0
    # class 4: never true -> recall NULL, precision 0
    assert rows[4].recall is None and rows[4].precision == 0.0


def test_classification_report_planted_perfect_head(spark):
    """End-to-end train→classify→report: a marker-vocabulary K=3 head
    must reach f1 = 1.0 on every class of held-out docs."""
    rows = []
    words = {0: "alpha", 1: "bravo", 2: "charlie"}
    for i in range(90):
        k = (i // 2) % 3
        rows.append((i, f"{words[k]} filler{i % 5} {words[k]}", k))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    train, test = df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1")
    model = tr.naive_bayes_model(train, "doc_id", "text", "y", num_buckets=64)
    pred = tr.naive_bayes_classify(test, model, "doc_id", "text", num_buckets=64)
    rep = tr.classification_report(
        pred.join(test.select("doc_id", "y"), "doc_id"), "y", "pred_class"
    ).collect()
    assert len(rep) == 3
    assert all(r.f1 == 1.0 for r in rep)


def test_temperature_mixture_weights_exact_and_upsamples_tail(spark):
    from us_immigration_data_lake_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    rows = [("big", 900), ("mid", 90), ("tiny", 10), ("zero", 0)]
    df = spark.createDataFrame(rows, "src string, n_tok long")
    out = {r["group"]: r for r in temperature_mixture_weights(
        df, "src", "n_tok", alpha=0.5, budget=1000
    ).collect()}
    assert "zero" not in out          # empty sources sample nothing
    # python replay of the exact integerization contract
    tot = 1000
    w = {g: round(1e6 * (n / tot) ** 0.5) for g, n in rows[:3]}
    ws = sum(w.values())
    for g, n in rows[:3]:
        r = out[g]
        assert (r.n, r.w_micro) == (n, w[g])
        assert r.q_ppm == round(1e6 * w[g] / ws)
        assert r.alloc == round(1000 * w[g] / ws)
    # α < 1 up-samples the tail: tiny's share rises above its raw 1%
    assert out["tiny"].q_ppm > 10_000
    # and the head is down-sampled below its raw 90%
    assert out["big"].q_ppm < 900_000
    # α = 1 degenerates to proportional sampling
    prop = {r["group"]: r.q_ppm for r in temperature_mixture_weights(
        df, "src", "n_tok", alpha=1.0
    ).collect()}
    assert abs(prop["big"] - 900_000) <= 1
