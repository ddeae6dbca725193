"""Sub-document boilerplate removal: window construction, repeated-
segment census, and order-preserving reassembly on a hand-built
corpus where the expected survivors are computed by hand."""

from __future__ import annotations

import hashlib

from us_immigration_data_lake_spark.operators.dedup import (
    boilerplate_segments,
    doc_segments,
    remove_boilerplate,
)

# 3-word windows. "shared header text" opens docs a and b (boilerplate,
# 2 distinct docs); everything else is unique to its doc.
DOCS = [
    ("a", "shared header text alpha beta gamma delta eps zeta"),
    ("b", "shared header text one two three"),
    ("c", "totally unique content here now friend"),
    ("d", "shared header text"),  # ALL segments boilerplate
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_doc_segments_windows_and_tail(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    segs = {
        (r.doc_id, r.seg_id): r.seg
        for r in doc_segments(df, "doc_id", "text", seg_words=3).collect()
    }
    assert segs[("a", 0)] == "shared header text"
    assert segs[("a", 1)] == "alpha beta gamma"
    assert segs[("a", 2)] == "delta eps zeta"
    assert segs[("b", 1)] == "one two three"
    assert segs[("c", 1)] == "here now friend"
    # short tail window: 7th word alone in its own segment
    e = spark.createDataFrame([("e", "one two three four five six seven")], ["doc_id", "text"])
    tail = {
        r.seg_id: r.seg
        for r in doc_segments(e, "doc_id", "text", seg_words=3).collect()
    }
    assert tail[2] == "seven"
    assert ("d", 1) not in segs


def test_boilerplate_census_counts_distinct_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    segs = doc_segments(df, "doc_id", "text", seg_words=3)
    boiler = {
        r.seg_hash: r.n_docs
        for r in boilerplate_segments(segs, "doc_id", min_docs=2).collect()
    }
    assert boiler == {_md5("shared header text"): 3}


def test_remove_boilerplate_reassembles_in_order(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in remove_boilerplate(
            df, "doc_id", "text", seg_words=3, min_docs=2
        ).collect()
    }
    assert out["a"].n_segments == 3 and out["a"].n_kept == 2
    assert out["a"].cleaned_md5 == _md5("alpha beta gamma delta eps zeta")
    assert out["b"].cleaned_md5 == _md5("one two three")
    # untouched doc: digest equals the original text's digest
    assert out["c"].n_kept == 2
    assert out["c"].cleaned_md5 == _md5("totally unique content here now friend")
    # fully-boilerplate doc survives as an empty document, not a lost row
    assert out["d"].n_segments == 1 and out["d"].n_kept == 0
    assert out["d"].cleaned_md5 == _md5("")


def test_threshold_disables_removal(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = remove_boilerplate(
        df, "doc_id", "text", seg_words=3, min_docs=99
    ).collect()
    assert all(r.n_kept == r.n_segments for r in out)


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (same dedup family, small corpus)
# ---------------------------------------------------------------------------


def _sets_df(spark, sets):
    return spark.createDataFrame(
        [(i, list(s)) for i, s in sets.items()], ["doc_id", "shingles"]
    )


def _brute(sets, t_pm):
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(set(sets[a]) & set(sets[b]))
            union = len(set(sets[a]) | set(sets[b]))
            if union and inter * 1000 >= t_pm * union:
                out[(a, b)] = (inter, union)
    return out


def test_prefix_join_matches_brute_force(spark):
    from us_immigration_data_lake_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    sets = {
        1: ["a", "b", "c", "d"],
        2: ["a", "b", "c", "e"],      # J(1,2)=3/5=0.6
        3: ["x", "y", "z"],
        4: ["x", "y", "q", "r"],      # J(3,4)=2/5=0.4
        5: ["unique1", "unique2"],
        6: ["a", "m", "n", "o", "p"], # J(1,6)=1/8=0.125
    }
    got = {
        (r.id1, r.id2): (r.inter, r.union_sz)
        for r in prefix_jaccard_pairs(
            _sets_df(spark, sets), "doc_id", 300
        ).collect()
    }
    assert got == _brute(sets, 300)


def test_prefix_join_boundary_threshold(spark):
    from us_immigration_data_lake_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    # J exactly == t must be KEPT (>=): two sets with J = 1/2.
    # Two independent fixed-machinery-bound collects (~17 s each on
    # 2-row input) — thread them (r13 durations profile)
    from concurrent.futures import ThreadPoolExecutor

    sets = {1: ["a", "b"], 2: ["a", "c"]}  # inter 1, union 3 → 333‰
    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(
            lambda: prefix_jaccard_pairs(
                _sets_df(spark, sets), "doc_id", 333
            ).collect()
        )
        f2 = ex.submit(
            lambda: prefix_jaccard_pairs(
                _sets_df(spark, sets), "doc_id", 334
            ).collect()
        )
        got, got2 = f1.result(), f2.result()
    assert len(got) == 1 and got[0].jaccard_permille == 333
    assert got2 == []


def test_prefix_join_validates_threshold(spark):
    import pytest

    from us_immigration_data_lake_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_pairs(_sets_df(spark, {1: ["a"]}), "doc_id", 0)
