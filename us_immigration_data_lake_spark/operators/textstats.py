"""Text-analysis operators (SURVEY.md §2.10): token statistics, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is native Spark SQL expressions (JVM-side, codegen'd) — no
Python UDFs anywhere in the hot path. All ratios are exact-integer
numerators/denominators divided once in double, so results are
bitwise-reproducible and oracle-comparable (see plans/queries.py rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.functions.text import normalized_text, tokens

# public, conventional stopword markers per language (tiny profiles —
# the heuristic is a count-argmax over these; real pipelines would use
# full profiles, same plan shape).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "que", "y", "por"),
    "fr": ("le", "les", "et", "des", "une", "dans"),
    "zh": ("的", "了", "是", "在", "我", "有"),
}

_STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "it")


def _count_in(tok: Column, words: tuple[str, ...]) -> Column:
    """# tokens ∈ words — exact integer, single array pass."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, t))).cast("long")


def text_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document feature bundle: char/token counts, distinct-token
    count, stopword count, punctuation count — all exact integers."""
    tok = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars_obs"),
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_distinct_tokens"),
        _count_in(tok, _STOPWORDS).alias("n_stopwords"),
        F.length(F.regexp_replace(text_col, r"[^\.\,\!\?\;\:]", "")).cast("long")
        .alias("n_punct"),
        F.aggregate(
            F.transform(tok, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_token_len"),
    )


def quality_score(features: DataFrame) -> DataFrame:
    """Composite quality score from exact-integer features — the
    length/stopword/uniqueness heuristic family used to filter LLM
    training corpora. One double expression at the end (deterministic:
    same operands, same op order on both engines)."""
    nt = F.col("n_tokens").cast("double")
    uniq = F.col("n_distinct_tokens") / nt
    stop = F.col("n_stopwords") / nt
    meanlen = F.col("sum_token_len") / nt
    length_score = F.least(nt / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * uniq
        + F.lit(0.2) * F.least(stop * 5.0, F.lit(1.0))
        + F.lit(0.2) * length_score
        + F.lit(0.2) * F.least(meanlen / 8.0, F.lit(1.0))
    )
    # empty documents (n_tokens=0) score 0, not null/NaN from 0/0
    score = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(score)
    return features.withColumn("quality_score", F.round(score, 6))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: count profile hits per language on
    the token array; argmax with first-profile-wins ties (deterministic).
    Comparisons are on raw integer counts (same denominator), so no
    float ordering ambiguity exists."""
    tok = tokens(F.lower(F.col(text_col)))
    out = df.select(F.col(id_col), *[c for c in df.columns if c != id_col])
    for lang, words in LANG_PROFILES.items():
        out = out.withColumn(f"score_{lang}", _count_in(tok, words))
    langs = list(LANG_PROFILES)
    pred = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if pred is None:
            pred = F.when(cond, branch)
        elif cond is not None:
            pred = pred.when(cond, branch)
        else:
            pred = pred.otherwise(branch)
    return out.withColumn("predicted_lang", pred)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    base: int = 257,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    polynomial rolling hash over character k-grams, keep each sliding
    window's minimum, distinct. The standard chunk-level fingerprint
    for plagiarism/near-dup detection — robust to insertions because a
    local edit only perturbs nearby windows.

    Entirely native expression arithmetic (fold inside F.aggregate) —
    the hash values are plain modular bigint math, reproducible in any
    engine. Documents shorter than k+window-1 chars fall back to one
    whole-text hash.
    """
    from pyspark.sql.window import Window

    def poly(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: (acc * base + x) % mod
        )

    # Explode + window-function pipeline rather than nested
    # arrays-of-arrays: a nested HOF expression (grams built from
    # codes built from chars, each referenced multiple times)
    # duplicates its subtree at every reference and Catalyst's
    # CollapseProject re-inlines any staging columns — the optimizer
    # then walks an exponentially large tree and never finishes. Here
    # every per-row expression is small; the per-doc ordering is a
    # (doc, pos) window — one shuffle, linear work, and the same shape
    # scales to billion-document corpora.
    txt = normalized_text(F.col(text_col))
    codes = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.filter(F.split(txt, ""), lambda c: c != F.lit("")),
                lambda c: F.ascii(c).cast("long"),
            )
        ).alias("pos", "code"),
    )
    w_gram = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, k - 1)
    )
    grams = (
        codes.withColumn("gram_codes", F.collect_list("code").over(w_gram))
        .filter(F.size("gram_codes") == k)
        .select(F.col(id_col), "pos", poly(F.col("gram_codes")).alias("gh"))
    )
    w_min = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    mins = (
        grams.withColumn("win", F.collect_list("gh").over(w_min))
        .filter(F.size("win") == window)
        .select(F.col(id_col), F.array_min("win").alias("fingerprint"))
        .dropDuplicates()
    )
    # documents too short for a full k-gram window fall back to one
    # whole-text hash so they remain fingerprintable
    short = (
        df.select(
            F.col(id_col),
            F.transform(
                F.filter(F.split(txt, ""), lambda c: c != F.lit("")),
                lambda c: F.ascii(c).cast("long"),
            ).alias("codes"),
        )
        .filter(F.size("codes") < k + window - 1)
        .select(F.col(id_col), poly(F.col("codes")).alias("fingerprint"))
    )
    return mins.unionByName(short)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a training/RAG corpus build.

    Output: (id, chunk_idx, chunk_start_token, chunk_text, n_tokens).
    Stride = chunk_tokens - overlap; the final chunk may be short but
    is never empty; single-short-doc → one chunk. Pure expression
    arithmetic (sequence + slice inside ONE transform level — flat,
    see the nested-HOF hazard note on winnow_fingerprints)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    tok = tokens(normalized_text(F.col(text_col)))
    staged = df.select(F.col(id_col), tok.alias("__tok"))
    n = F.size("__tok")
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            (i * stride).cast("long").alias("chunk_start_token"),
            F.array_join(
                F.slice(F.col("__tok"), i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens)).cast("long").alias("n_tokens"),
        ),
    )
    return (
        staged.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            "c.chunk_idx",
            "c.chunk_start_token",
            "c.chunk_text",
            "c.n_tokens",
        )
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (etl.py's capitalize/normalize family generalized to
    content addressing for dedup)."""
    return df.select(
        F.col(id_col),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )
