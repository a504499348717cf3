"""Corpus-curation operators for training-data pipelines.

The reference engine stops at embed/search (core/src/query.rs); a corpus
pipeline at 100 TB additionally needs deterministic splits, per-source
caps, and benchmark decontamination before any training run. These are
first-class operators with DuckDB-oracle parity, built on the shared
expression library (functions/text.py, operators/dedup.poly_hash_expr).

Scale notes:
- ``hash_split`` is a pure per-row projection — no shuffle, no state; the
  split is a function of the key alone, so it is stable across reruns,
  cluster sizes, and partitionings (the property that matters for
  reproducible train/val/test membership).
- ``domain_cap`` windows per domain — the shuffle is on the domain key
  only, and the rank early-outs at ``cap`` per group via the window's
  running row_number (skew: one giant domain concentrates on one task;
  pre-aggregate or salt upstream if a single domain exceeds a partition).
- ``contamination_flags`` is an inverted-index equi-join on n-gram keys:
  the benchmark side is typically tiny (eval suites), so it broadcasts;
  the corpus side explodes to (gram, doc) postings and never self-joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pg_vectorize_spark.functions.text import (
    raw_words_expr,
    word_ngrams_expr,
)
from pg_vectorize_spark.operators.dedup import poly_hash_expr

SPLIT_BUCKETS = 10_000
# Knuth's multiplicative (Fibonacci) mixing constant and modulus: the raw
# polynomial hash is a WEAK mixer — a short decimal key spans only ~9e3 of
# the 31^len value range, so `poly_hash % buckets` concentrates in one
# band (measured: an 80% split cut captured 37% of 300 integer keys).
# One multiply + high-bits extraction fixes it (measured 0.7967/0.8000/
# 0.8001 at n=300/5e3/5e4) and stays exact BIGINT in Spark AND DuckDB.
MIX_MULT = 2_654_435_761
MIX_BITS = 32


def bucket_expr(key: Column, buckets: int, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, buckets): Fibonacci-mix the
    polynomial string hash of ``key || salt``, take the high bits.
    Distinct salts give independent bucketings of the same keys."""
    salted = (
        F.concat(key.cast("string"), F.lit(salt)) if salt else key.cast("string")
    )
    mixed = (poly_hash_expr(salted) * F.lit(MIX_MULT)) % F.lit(1 << MIX_BITS)
    return F.shiftright(mixed * F.lit(buckets), MIX_BITS)


def hash_split_expr(key: Column, splits: Sequence[tuple[str, float]]) -> Column:
    """Split label from a deterministic hash of ``key``.

    ``splits`` is an ordered list of (name, fraction); fractions must sum
    to 1. The key hashes into ``SPLIT_BUCKETS`` buckets (Fibonacci-mixed,
    see ``bucket_expr``) and the ordered cumulative fractions carve the
    bucket range, so membership is exact to 1/SPLIT_BUCKETS and every row
    gets exactly one label.
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = bucket_expr(key, SPLIT_BUCKETS)
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cut = int(round(cum * SPLIT_BUCKETS))
        cond = bucket < F.lit(cut)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = splits[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
) -> DataFrame:
    """Assign a deterministic train/val/test split label per row."""
    return df.withColumn("split", hash_split_expr(F.col(key_col), splits))


def _salted_precap(
    df: DataFrame,
    part_cols: Sequence[Column],
    order: Sequence[Column],
    cap: int,
    pkey: str,
    salt_buckets: int,
) -> DataFrame:
    """Skew-safe pre-filter for per-group top-``cap`` windows: rank within
    (group, hash-salt-bucket) and keep ranks <= cap. A row with GLOBAL
    in-group rank <= cap necessarily ranks <= cap inside its bucket too, so
    no true survivor is dropped — the exact window that follows sees at
    most ``salt_buckets * cap`` rows per group instead of the whole group.
    That bounds the hot partition of the exact pass on a mega-domain (40%
    web-crawl at 100 TB) without changing a single output row.
    """
    salt = F.pmod(
        F.xxhash64(F.col(pkey).cast("string"), F.lit("|precap")),
        F.lit(salt_buckets),
    )
    w = Window.partitionBy(*part_cols, salt).orderBy(*order)
    return (
        df.withColumn("_pre_rank", F.row_number().over(w))
        .filter(F.col("_pre_rank") <= cap)
        .drop("_pre_rank")
    )


def domain_cap(
    df: DataFrame,
    pkey: str,
    domain_col: str,
    cap: int,
    order_by: Column | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, deterministically.

    Rows rank within their domain by ``order_by`` (default: ascending
    primary key) with the pkey as the tiebreaker; ranks > cap are dropped.
    The surviving rows carry their ``domain_rank``.

    Two-phase for skew: a salted pre-cap (``_salted_precap``) bounds the
    exact window's per-domain input to ``salt_buckets * cap`` rows, so one
    mega-domain can't concentrate the ranking shuffle onto a single task.
    Output is identical with or without salting (``salt_buckets=0``
    disables, for A/B tests).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    order = [order_by, F.asc(pkey)] if order_by is not None else [F.asc(pkey)]
    if salt_buckets and salt_buckets > 1:
        df = _salted_precap(
            df, [F.col(domain_col)], order, cap, pkey, salt_buckets
        )
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )


def corpus_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    text_col: str,
    min_words: int = 20,
) -> DataFrame:
    """Per-group corpus report: doc count, token/char totals, Gopher pass
    count, mean tokens per doc — the summary a curation run ships with.

    Float-parity discipline: every aggregate is an exact integer sum
    (order-independent under any shuffle), and the only double —
    ``mean_tokens`` — is a single division of two exact integers computed
    AFTER aggregation, so the result hashes identically regardless of
    partitioning. Plan: map-side partial aggregation into one shuffle on
    the group keys.
    """
    from pg_vectorize_spark.functions.text import (
        gopher_pass_expr,
        token_count_expr,
    )

    t = F.coalesce(F.col(text_col), F.lit(""))
    per_doc = df.select(
        *group_cols,
        token_count_expr(F.col(text_col)).alias("_tok"),
        F.length(t).cast("long").alias("_chars"),
        # r13 optimization round: single-consumer conjunction -> the
        # bound form (words tokenized once; see gopher_pass_expr)
        gopher_pass_expr(F.col(text_col), min_words=min_words)
        .cast("long")
        .alias("_pass"),
    )
    agg = per_doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.sum("_chars").alias("total_chars"),
        F.sum("_pass").alias("n_gopher_pass"),
    )
    return agg.withColumn(
        "mean_tokens",
        F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
    )


def contamination_flags(
    corpus_df: DataFrame,
    bench_df: DataFrame,
    pkey: str,
    text_col: str,
    k: int = 5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word k-gram
    with a benchmark set (the published n-gram-overlap decontamination
    procedure used for LLM training corpora).

    Returns (pkey, n_shared_grams) for contaminated docs only, where
    ``n_shared_grams`` counts DISTINCT k-grams of the doc that appear
    anywhere in the benchmark set.

    Shape: distinct benchmark grams (one small aggregate) equi-join the
    corpus (doc, gram) postings — broadcast when ``broadcast_bench`` (eval
    sets are tiny next to a 100 TB corpus), hash-join otherwise. Never a
    cross join; never a corpus self-join.
    """
    from pg_vectorize_spark.functions.text import bind_once_expr

    # r13 optimization round: bound word array — word_ngrams_expr
    # references it ~2k times in interpreted eval (see
    # duplicated_span_stats)
    grams = lambda c: bind_once_expr(  # noqa: E731
        raw_words_expr(c),
        lambda ws: F.array_distinct(word_ngrams_expr(ws, k)),
    )
    bench_grams = (
        bench_df.select(F.explode(grams(F.col(text_col))).alias("_gram"))
        .distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    postings = ensure_min_partitions(corpus_df, pin=False).select(
        F.col(pkey), F.explode(grams(F.col(text_col))).alias("_gram")
    )
    return (
        postings.join(bench_grams, "_gram")
        .groupBy(pkey)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def weighted_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "|mix",
) -> DataFrame:
    """Deterministic weighted corpus mixing: each row's expected
    multiplicity equals its stratum's weight. ``w < 1`` downsamples
    (w = 0 drops the stratum), ``w > 1`` replicates — the standard
    multi-epoch source-weighting step of an LLM data mixture (e.g.
    wiki x2.5, web x0.5), emitted as rows with a ``copy_idx``.

    A row gets ``floor(w)`` copies plus one more iff its salted key-hash
    bucket falls under the fractional part — so multiplicity is a pure
    function of (key, stratum): stable across reruns, partitionings and
    cluster sizes, and independent of ``hash_split`` membership (distinct
    salt through the Fibonacci-mixed ``bucket_expr``; property-tested
    against hash_split).

    Shape: zero shuffle — projection + generator explode; output size is
    bounded by ``ceil(max weight) * |input|``.
    """
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for stratum {k!r}: {w}")
    bucket = bucket_expr(F.col(key_col), SPLIT_BUCKETS, salt=salt)

    def _case(value_of) -> Column:
        expr = None
        for k, w in weights.items():
            cond = F.col(strata_col) == k
            v = F.lit(value_of(w))
            expr = F.when(cond, v) if expr is None else expr.when(cond, v)
        dflt = F.lit(value_of(default_weight))
        return dflt if expr is None else expr.otherwise(dflt)

    base = _case(lambda w: int(w))
    cut = _case(lambda w: int(round((w - int(w)) * SPLIT_BUCKETS)))
    copies = base + F.when(bucket < cut, F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") >= 1)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("_copies").cast("long"))
            ),
        )
        .drop("_copies")
    )


def vocabulary(
    df: DataFrame,
    text_col: str,
    pkey: str,
    top_n: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: (word, n, n_docs) — the word-count pre-pass of
    tokenizer training (BPE/unigram-LM start from exactly this table).

    Two-stage hash aggregate on the word key (count/count-distinct are
    algebraic: map-side combiners absorb the Zipf head before the
    shuffle). ``top_n`` ranks by (n desc, word asc) — a deterministic
    TakeOrdered, never a global sort.
    """
    from pg_vectorize_spark.functions.text import raw_words_expr
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    words = ensure_min_partitions(df, pin=False).select(
        F.col(pkey), F.explode(raw_words_expr(F.col(text_col))).alias("word")
    )
    vocab = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(pkey)).alias("n_docs"),
    )
    if top_n is not None:
        vocab = vocab.orderBy(F.desc("n"), F.asc("word")).limit(top_n)
    return vocab


LOGPROB_SCALE = 1_000_000_000  # 1e9: nano-log units


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    pkey: str,
) -> DataFrame:
    """Per-document mean unigram log-likelihood under the corpus's own
    word distribution — the classic perplexity-style quality filter
    (docs far below the corpus mean read as noise/boilerplate/garble).

    Output: (pkey, n_words, mean_logprob); zero-word docs are absent.

    Float discipline: per-word log p comes from ONE vectorized Arrow
    batch over the vocabulary (Python's libm ``log`` — bit-identical to
    DuckDB's ``ln``; JVM Math.log is 1 ulp off on some inputs), then is
    floored into integer nano-log units, so the per-doc sum is an exact
    BIGINT aggregate — associative, shuffle-order-free — and only the
    final mean divides back into float64. Worst case fits comfortably:
    |log p| < 50 -> 5e10 nano-units/word, 1e6-word doc -> 5e16 << 2^63.

    Shape: one shuffle on word (vocab count), one equi-join of postings
    to per-word logprob (build side has one row per key: Zipf-head skew
    is partition imbalance, not fanout — AQE splits it), one shuffle on
    pkey for the doc sum.
    """
    import math as _math

    from pg_vectorize_spark.functions.text import raw_words_expr
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    words = (
        ensure_min_partitions(df, pin=False)  # batch corpus path
        .select(
            F.col(pkey), F.explode(raw_words_expr(F.col(text_col))).alias("word")
        )
        .localCheckpoint(eager=False)  # read twice: vocab + scoring join
    )
    # r13 optimization round: vocab feeds BOTH the grand-total aggregate
    # and the scoring join — checkpoint so the posting-stream count runs
    # once (vocabulary-sized frame; §2.4)
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    total = vocab.agg(F.sum("_n").alias("_total"))
    _ln = F.pandas_udf(lambda s: s.map(_math.log), "double")
    lp = (
        vocab.crossJoin(F.broadcast(total))
        .withColumn(
            "_lp9",
            F.floor(
                _ln(F.col("_n").cast("double") / F.col("_total").cast("double"))
                * F.lit(float(LOGPROB_SCALE))
            ).cast("long"),
        )
        .select("word", "_lp9")
    )
    per = (
        words.join(lp, "word")
        .groupBy(pkey)
        .agg(
            F.sum("_lp9").alias("_s"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    return per.select(
        pkey,
        "n_words",
        (
            (F.col("_s").cast("double") / F.lit(float(LOGPROB_SCALE)))
            / F.col("n_words").cast("double")
        ).alias("mean_logprob"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    pkey: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean CONDITIONAL bigram log-likelihood under the
    corpus's own add-alpha-smoothed bigram model — one modeling step up
    from ``unigram_logprob`` toward the CCNet/KenLM perplexity filter
    (word-order-aware: shuffled or templated text scores far below
    fluent text with the same word histogram, which the unigram score
    cannot see).

        p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)

    with c(w1) the CONTEXT count (sum of bigram counts from w1) and V
    the corpus vocabulary size. Output: (pkey, n_bigrams, mean_logprob);
    docs with fewer than two words are absent.

    Float discipline matches unigram_logprob: the ratio is JVM float64
    (IEEE-exact, mirrored in SQL), ln comes from ONE vectorized Arrow
    batch over the bigram table (libm, bit-identical to DuckDB), floored
    into integer nano-log units so the per-doc sum is an exact BIGINT
    aggregate; only the final mean divides back to float64. ``alpha``
    defaults to 0.5 (exactly representable — no literal-parsing drift).

    Shape: bigrams form IN-ROW from each document's word array (two
    shifted slices zipped — adjacent words already sit adjacent in the
    array, so pairing them needs no keyed lead window; the window form
    exchanged AND sorted the whole corpus word stream by (pkey, pos)
    just to look one row ahead — r13 optimization round, §2.4);
    bigram/context counts are two keyed aggregates; the scoring join is
    equi on (w1, w2) with one-row V/total broadcasts. Zipf-head skew is
    partition imbalance on the count shuffle, not fanout — AQE splits
    it.
    """
    import math as _math

    from pg_vectorize_spark.functions.text import raw_words_expr
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    # one tokenize pass serves BOTH the bigram explode and the
    # vocabulary-size aggregate (§2.4); the checkpointed word array is a
    # plain attribute afterwards, so the shifted slices below re-read a
    # materialized column, not the regex split
    base = ensure_min_partitions(df, pin=False).select(
        F.col(pkey), raw_words_expr(F.col(text_col)).alias("_ws")
    ).localCheckpoint(eager=False)
    ws = F.col("_ws")
    n_pairs_col = F.greatest(F.size(ws) - F.lit(1), F.lit(0))
    # arrays_zip, NOT zip_with: no lambda means the pair projection
    # stays in whole-stage codegen (the zip_with+struct form is a
    # higher-order function -> CodegenFallback, and the interpreted
    # per-word struct build measured SLOWER than the window it
    # replaced — scripts/bigram_shape_probe.py)
    pairs = F.arrays_zip(
        F.slice(ws, 1, n_pairs_col).alias("w1"),
        F.slice(ws, 2, n_pairs_col).alias("w2"),
    )
    big = (
        base.select(F.col(pkey), F.explode(pairs).alias("_bg"))
        .select(pkey, "_bg.w1", "_bg.w2")
        .localCheckpoint(eager=False)  # read twice: counts + scoring join
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    # in-doc dedup first: countDistinct sees |doc|-bounded rows, and the
    # value equals the distinct count over all word positions exactly
    vocab_size = base.select(
        F.explode(F.array_distinct(ws)).alias("w1")
    ).agg(F.countDistinct("w1").cast("long").alias("_v"))
    _ln = F.pandas_udf(lambda s: s.map(_math.log), "double")
    lp = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .withColumn(
            "_lp9",
            F.floor(
                _ln(
                    (F.col("_c12").cast("double") + F.lit(float(alpha)))
                    / (
                        F.col("_c1").cast("double")
                        + F.lit(float(alpha)) * F.col("_v").cast("double")
                    )
                )
                * F.lit(float(LOGPROB_SCALE))
            ).cast("long"),
        )
        .select("w1", "w2", "_lp9")
    )
    per = (
        big.join(lp, ["w1", "w2"])
        .groupBy(pkey)
        .agg(
            F.sum("_lp9").alias("_s"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    return per.select(
        pkey,
        "n_bigrams",
        (
            (F.col("_s").cast("double") / F.lit(float(LOGPROB_SCALE)))
            / F.col("n_bigrams").cast("double")
        ).alias("mean_logprob"),
    )


def sample_priority_expr(key: Column, salt: str = "|sample") -> Column:
    """Deterministic per-row sampling priority in [0, 2^32): the
    Fibonacci-mixed salted key hash (see ``bucket_expr``); distinct salts
    give independent orderings."""
    salted = F.concat(key.cast("string"), F.lit(salt))
    return (poly_hash_expr(salted) * F.lit(MIX_MULT)) % F.lit(1 << MIX_BITS)


def sample_exact(
    df: DataFrame,
    key_col: str,
    k: int,
    strata_col: str | None = None,
    salt: str = "|sample",
    salt_buckets: int = 32,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum (or overall), chosen by
    hash priority — the reproducible eval-subset / human-review draw.
    ``weighted_mix`` hits a RATE in expectation; this hits a COUNT
    exactly. Surviving rows carry ``sample_rank`` (1..k by priority,
    key-tiebroken), so nested draws are prefix-stable: rank <= j for
    j < k is the same set a k=j call returns.

    Skew-safe like ``domain_cap``: a salted pre-cap bounds the exact
    per-stratum window to ``salt_buckets * k`` candidate rows, so a giant
    stratum (or the no-strata whole-corpus draw) never funnels the full
    table through one task. Identical output either way.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    part = [F.col(strata_col)] if strata_col else []
    prio = sample_priority_expr(F.col(key_col), salt)
    order = [prio.asc(), F.col(key_col).asc()]
    if salt_buckets and salt_buckets > 1:
        df = _salted_precap(df, part, order, k, key_col, salt_buckets)
    w = Window.partitionBy(*part).orderBy(*order)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


DIVERGENCE_SCALE = 1_000_000_000_000  # 1e12: pico-nat units per term


def source_divergence(
    df: DataFrame,
    text_col: str,
    strata_col: str,
) -> DataFrame:
    """Per-stratum KL(stratum ‖ corpus) over word distributions, in nats
    — the drift/contamination smoke alarm of a mixed corpus: a source
    whose language diverges from the blend (template spam, wrong-language
    dumps, mojibake) shows up as a KL outlier before any model sees it.

    Output: (strata, n_words, kl_nats). Every stratum word appears in the
    corpus vocabulary by construction, so q(w) > 0 and the sum is finite.

    Float discipline: p, q and p·ln(p/q) are identical expression trees
    in both engines (libm ``ln`` via one vectorized Arrow batch), each
    term floors into pico-nat BIGINTs, and the per-stratum sum is exact
    integer arithmetic — shuffle-order-free. No overflow: the positive
    terms sum to at most KL <= ln(N) nats (~50e12 pico-nats) and each
    negative term is bounded by p·ln(q) >= -50, so the running BIGINT
    total stays around ±5e13·vocab-fraction — orders below 2^63.

    Shape: ONE pass over the exploded words — the (stratum, word)
    count table is the only word-volume aggregate; the corpus counts,
    stratum totals, and grand total are integer roll-ups OF that table
    (exact, so bit-identical to counting the words directly), which is
    |vocab x strata| rows instead of the full posting stream. Then one
    equi-join on word and one stratum-keyed aggregate. The Arrow batch
    runs over (stratum, word) rows — the one place Python touches
    data, and the price of bit-exact log parity with the oracle.
    """
    import math as _math

    from pg_vectorize_spark.functions.text import raw_words_expr
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    words = ensure_min_partitions(df, pin=False).select(
        F.col(strata_col).alias("_s"),
        F.explode(raw_words_expr(F.col(text_col))).alias("word"),
    )
    strat_counts = (
        words.groupBy("_s", "word")
        .agg(F.count(F.lit(1)).alias("_csw"))
        # four consumers (the join + three roll-ups): materialize the
        # compressed table once, not four passes over the posting stream
        .localCheckpoint(eager=False)
    )
    corpus_counts = strat_counts.groupBy("word").agg(
        F.sum("_csw").alias("_cw")
    )
    strat_totals = strat_counts.groupBy("_s").agg(
        F.sum("_csw").alias("_ns")
    )
    grand = strat_counts.agg(F.sum("_csw").alias("_n"))

    _ln = F.pandas_udf(lambda s: s.map(_math.log), "double")
    joined = (
        strat_counts.join(corpus_counts, "word")
        .join(strat_totals, "_s")
        .crossJoin(F.broadcast(grand))
    )
    p = F.col("_csw").cast("double") / F.col("_ns").cast("double")
    q = F.col("_cw").cast("double") / F.col("_n").cast("double")
    term12 = F.floor(p * _ln(p / q) * F.lit(float(DIVERGENCE_SCALE))).cast(
        "long"
    )
    per = joined.select("_s", F.col("_ns"), term12.alias("_t12"))
    agg = per.groupBy("_s").agg(
        F.sum("_t12").alias("_kl12"), F.min("_ns").alias("n_words")
    )
    return agg.select(
        F.col("_s").alias(strata_col),
        "n_words",
        (F.col("_kl12").cast("double") / F.lit(float(DIVERGENCE_SCALE))).alias(
            "kl_nats"
        ),
    )


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    pkey: str,
    n_buckets: int = 512,
    smoothing: float = 1.0,
    single_pass: bool = True,
) -> DataFrame:
    """DSIR hashed importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", 2023): score every raw
    document by how target-like its hashed-token distribution is,

        log w(x) = Σ_b c_b(x) · (ln p_target[b] − ln p_raw[b]),

    where c_b(x) counts the document's words landing in hash bucket b
    and the bucket distributions are add-``smoothing`` estimates from
    the target/raw corpora. Sampling proportionally to w (Gumbel top-k
    over log_weight, operators/curate.sample_exact precedent) is the
    paper's importance-resampling step; the weights are the reusable
    part.

    Output: (pkey, n_tokens, log_weight) for raw_df rows with >= 1
    token.

    Float discipline (the unigram_logprob contract): the per-bucket
    ``ln p_t − ln p_r`` delta is computed in ONE Arrow batch over the
    <= n_buckets rows with Python's libm log (bit-identical to DuckDB's
    ``ln``), floored into integer nano-log units, so the per-document
    sum is an exact BIGINT aggregate — associative and shuffle-order-
    free — and only the final result divides back to float64.

    Scale shape (``single_pass=True``, the default): the RAW corpus
    text is exploded ONCE into a per-document bucket histogram
    (pkey, bucket, count) — a compression of the corpus, materialized
    — from which BOTH the raw bucket distribution (groupBy bucket over
    <= n_buckets keys) and the per-document score (broadcast the tiny
    delta table, one keyed integer aggregate with multiplicities) are
    derived; only the target slice is exploded separately (it is an
    arbitrary caller frame, often a small filtered subset). The
    multiplicity-weighted sum ``Σ count·δ9`` over BIGINT nano-units is
    bit-identical to the per-posting sum, so the output matches the
    two-pass shape exactly. ``single_pass=False`` keeps the original
    explode-twice plan (each pass map-side-combines straight to
    n_buckets rows, no histogram materialization) — the A/B baseline,
    and the choice when the histogram (~docs × distinct-buckets rows)
    is larger than a second pass over the text. n_buckets is the
    memory/bias knob (the paper uses 10^4-10^5 for unigram+bigram).
    """
    import math as _math

    from pg_vectorize_spark.functions.text import raw_words_expr
    from pg_vectorize_spark.functions.vector import hash_bucket_expr
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    spark = raw_df.sparkSession

    def _bucket_counts(df: DataFrame) -> DataFrame:
        words = ensure_min_partitions(df, pin=False).select(
            F.explode(raw_words_expr(F.col(text_col))).alias("_w")
        )
        return (
            words.select(
                hash_bucket_expr(F.col("_w"), n_buckets).alias("_b")
            )
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_n"))
        )

    full = spark.range(n_buckets).select(F.col("id").alias("_b"))
    # each count table feeds its own total AND the stats join; the
    # frames are <= n_buckets rows — materialize instead of re-running
    # the corpus explode+count per consumer
    tgt = (
        full.join(_bucket_counts(target_df), "_b", "left")
        .select("_b", F.coalesce("_n", F.lit(0)).alias("_nt"))
        .localCheckpoint()
    )
    docbuckets = None
    if single_pass:
        # one corpus text read: the per-doc bucket histogram feeds BOTH
        # the raw distribution and the final per-doc score
        docbuckets = (
            ensure_min_partitions(raw_df, pin=False)  # batch corpus path
            .select(
                F.col(pkey),
                F.explode(raw_words_expr(F.col(text_col))).alias("_w"),
            )
            .select(
                F.col(pkey),
                hash_bucket_expr(F.col("_w"), n_buckets).alias("_b"),
            )
            .groupBy(pkey, "_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .localCheckpoint()
        )
        raw_counts = docbuckets.groupBy("_b").agg(
            F.sum("_n").alias("_n")
        )
    else:
        raw_counts = _bucket_counts(raw_df)
    raw = (
        full.join(raw_counts, "_b", "left")
        .select("_b", F.coalesce("_n", F.lit(0)).alias("_nr"))
        .localCheckpoint()
    )
    # smoothed distributions + nano-unit delta, one Arrow batch
    stats = (
        tgt.join(raw, "_b")
        .crossJoin(
            F.broadcast(
                tgt.agg(F.sum("_nt").alias("_tt")).crossJoin(
                    raw.agg(F.sum("_nr").alias("_tr"))
                )
            )
        )
    )
    s = float(smoothing)
    nb = float(n_buckets)

    def _delta(nt, nr, tt, tr):
        import pandas as pd

        out = []
        for a, b, c, d in zip(nt, nr, tt, tr):
            pt = (float(a) + s) / (float(c) + s * nb)
            pr = (float(b) + s) / (float(d) + s * nb)
            out.append(
                _math.floor(
                    (_math.log(pt) - _math.log(pr)) * 1_000_000_000.0
                )
            )
        return pd.Series(out)

    delta_udf = F.pandas_udf(_delta, "long")
    deltas = stats.select(
        "_b",
        delta_udf(
            F.col("_nt"),
            F.col("_nr"),
            F.col("_tt"),
            F.col("_tr"),
        ).alias("_d9"),
    )
    if single_pass:
        return (
            docbuckets.join(F.broadcast(deltas), "_b")
            .groupBy(pkey)
            .agg(
                F.sum("_n").alias("n_tokens"),
                F.sum(F.col("_n") * F.col("_d9")).alias("_s9"),
            )
            .select(
                F.col(pkey),
                F.col("n_tokens"),
                (
                    F.col("_s9").cast("double") / F.lit(1_000_000_000.0)
                ).alias("log_weight"),
            )
        )
    postings = ensure_min_partitions(raw_df, pin=False).select(
        F.col(pkey),
        F.explode(raw_words_expr(F.col(text_col))).alias("_w"),
    ).select(
        F.col(pkey), hash_bucket_expr(F.col("_w"), n_buckets).alias("_b")
    )
    return (
        postings.join(F.broadcast(deltas), "_b")
        .groupBy(pkey)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_d9").alias("_s9"),
        )
        .select(
            F.col(pkey),
            F.col("n_tokens"),
            (
                F.col("_s9").cast("double") / F.lit(1_000_000_000.0)
            ).alias("log_weight"),
        )
    )


def semantic_contamination_flags(
    train_df: DataFrame,
    pkey: str,
    emb_col: str,
    bench_df: DataFrame,
    bench_key: str,
    bench_emb_col: str,
    threshold: float = 0.9,
    nbits: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic
    complement of ``contamination_flags`` (which is n-gram exact):
    a train document is contaminated when its embedding sits at cosine
    >= ``threshold`` to ANY benchmark item, catching paraphrased /
    reformatted leakage the lexical overlap check misses (the
    embedding-similarity decontamination pass modern LLM data recipes
    run alongside n-gram matching).

    Output: one row per TRAIN document —
    (pkey, is_contaminated, max_bench_cosine, bench_match); documents
    with no candidate pair come back flagged False with NULL
    cosine/match (a cardinality-preserving operator, same contract as
    semantic_cluster_dedup).

    Scale shape: the cross-set pair space is pruned by the same
    sign-bit LSH candidate rule as ``cosine_neardup_pairs_bucketed`` —
    the benchmark side explodes its bucket into the <=probe_hamming-bit
    flips and the join is a plain hash equi-join on the bucket value
    (no CartesianProduct, no broadcast of the train table); candidates
    are exact-rescored and reduced per train key with one keyed
    aggregate. RECALL is approximate with the same calibration story:
    a true pair whose sign patterns differ in more than probe_hamming
    of the first nbits dims is missed; raise probe_hamming / nbits, or
    run the exact crossJoin on a sample to calibrate.
    """
    if probe_hamming > 1:
        raise ValueError(
            "probe_hamming > 1 not implemented (variant explosion grows "
            "as C(nbits, r); compose with IVF cells instead)"
        )
    from pg_vectorize_spark.functions.vector import cosine_similarity
    from pg_vectorize_spark.operators.ann import signbit_bucket_expr

    t = train_df.select(
        F.col(pkey).alias("_tid"),
        F.col(emb_col).alias("_tv"),
        signbit_bucket_expr(F.col(emb_col), nbits).alias("_bkt"),
    )
    b = bench_df.select(
        F.col(bench_key).alias("_bid"),
        F.col(bench_emb_col).alias("_bv"),
        signbit_bucket_expr(F.col(bench_emb_col), nbits).alias("_bkt"),
    )
    b_exploded = b.select(
        "_bid",
        "_bv",
        F.explode(
            F.array(
                F.col("_bkt"),
                *[
                    F.col("_bkt").bitwiseXOR(F.lit(1 << j))
                    for j in range(nbits)
                ],
            )
            if probe_hamming >= 1
            else F.array(F.col("_bkt"))
        ).alias("_bkt"),
    )
    scored = (
        t.join(b_exploded, "_bkt")
        .select(
            F.col("_tid"),
            F.col("_bid"),
            cosine_similarity(F.col("_tv"), F.col("_bv")).alias("_cos"),
        )
    )
    best = scored.groupBy("_tid").agg(
        F.max(F.struct(F.col("_cos"), F.col("_bid"))).alias("_best")
    )
    return (
        train_df.select(F.col(pkey))
        .join(best.withColumnRenamed("_tid", pkey), pkey, "left")
        .select(
            F.col(pkey),
            F.coalesce(
                F.col("_best._cos") >= F.lit(threshold), F.lit(False)
            ).alias("is_contaminated"),
            F.col("_best._cos").alias("max_bench_cosine"),
            F.col("_best._bid").alias("bench_match"),
        )
    )


def sequence_pack(
    df: DataFrame,
    key_col: str,
    count_col: str,
    block_size: int,
    salt: str = "|pack",
    order_buckets: int = 1024,
) -> DataFrame:
    """GPT-style sequence packing: lay the corpus's token streams out in
    a deterministic shuffle order, concatenate, and chop into fixed
    ``block_size``-token training blocks. Per input row the output says
    exactly where its tokens land: ``start_tok`` (0-based position in
    the concatenated stream), ``first_block``/``offset_in_block``,
    ``last_block``, and ``n_blocks`` spanned — everything a loader needs
    to materialize block ``b`` by fetching the docs whose
    [first_block, last_block] range covers it. Rows with a zero/NULL
    token count are dropped (they contribute no tokens).

    The shuffle order is the Fibonacci-mixed hash priority
    (``sample_priority_expr``; distinct salts give independent epoch
    orders), key-tiebroken — reproducible across reruns, cluster sizes
    and partitionings, like ``hash_split``.

    Scale shape — a distributed prefix sum, NOT a global window: a
    single ``Window.orderBy`` collapses the corpus onto one task. The
    priority space [0, 2^32) is pre-chopped into ``order_buckets``
    contiguous, hash-uniform ranges (deterministic integer division —
    no sampled RangePartitioner boundaries, so separate passes can
    never disagree); per-bucket token totals (``order_buckets`` rows)
    prefix-sum on the driver and broadcast back; the window runs
    per-bucket (~corpus/order_buckets rows per task). Everything is
    BIGINT arithmetic — bit-exact against the SQL-window oracle.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    if order_buckets < 1:
        raise ValueError(f"order_buckets must be >= 1, got {order_buckets}")
    width = -((1 << MIX_BITS) // -order_buckets)  # ceil: pid < order_buckets
    base = (
        df.select(F.col(key_col), F.col(count_col).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("_prio", sample_priority_expr(F.col(key_col), salt))
        .withColumn("_pid", F.expr(f"_prio div {width}"))
        # r13 optimization round: base is consumed TWICE (the bucket-total
        # collect below and the windowed output join) — without a
        # materialization point the upstream count projection (typically a
        # full tokenize scan) runs twice. The frame is (key, 3 longs) —
        # narrow next to the corpus text it replaces re-reading (§2.4).
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["_pid"], r["_tot"])
        for r in base.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot")).collect()
    )
    offsets, running = [], 0
    for pid, tot in totals:
        offsets.append((pid, running))
        running += tot
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, schema="_pid BIGINT, _poff BIGINT")
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_prio").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_poff") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = base.join(F.broadcast(off_df), "_pid").withColumn("start_tok", start)
    last = F.expr(f"(start_tok + n_tokens - 1) div {block_size}")
    first = F.expr(f"start_tok div {block_size}")
    return out.select(
        F.col(key_col),
        F.col("n_tokens"),
        F.col("start_tok"),
        first.alias("first_block"),
        (F.col("start_tok") % block_size).alias("offset_in_block"),
        last.alias("last_block"),
        (last - first + F.lit(1)).alias("n_blocks"),
    )


def pack_blocks(packed: DataFrame, block_size: int) -> DataFrame:
    """The loader-side view of ``sequence_pack``: one row per
    (block_id, doc) saying which token slice of the doc fills the block.
    A training loader materializes block ``b`` by fetching its rows in
    ``offset_in_block`` order and concatenating
    ``tokens[doc_from:doc_to)`` of each doc.

    Columns: block_id, doc_id (or the pack's key), offset_in_block
    (where the slice starts inside the block), doc_from/doc_to (the
    half-open token slice of the doc). Every block except the last sums
    to exactly ``block_size`` tokens by construction.

    Scale shape: a generator explode (each doc emits its n_blocks rows —
    corpus_tokens/block_size + n_docs rows total, linear) — no shuffle
    here; downstream per-block aggregations shuffle on the uniform
    block_id key.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    key_col = packed.columns[0]
    e = packed.withColumn(
        "block_id", F.explode(F.sequence(F.col("first_block"), F.col("last_block")))
    )
    block_start = F.col("block_id") * F.lit(block_size)
    return e.select(
        F.col("block_id"),
        F.col(key_col),
        F.greatest(F.col("start_tok") - block_start, F.lit(0)).alias(
            "offset_in_block"
        ),
        F.greatest(block_start - F.col("start_tok"), F.lit(0)).alias("doc_from"),
        F.least(
            block_start + F.lit(block_size) - F.col("start_tok"),
            F.col("n_tokens"),
        ).alias("doc_to"),
    )


def sample_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "|wsample",
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the exponential-race form): row i gets the race key
    ``-ln(u_i) / w_i`` from a deterministic per-key uniform
    ``u_i = (hash+1) / (2^32+1)``; the k SMALLEST keys are the sample —
    inclusion odds proportional to weight, reproducible across reruns,
    cluster sizes and partitionings (the ``hash_split`` property). The
    quality-weighted corpus draw of a training pipeline: weight by a
    quality/length score and the sample tilts to it deterministically.

    Output: (key, weight, sample_key, sample_rank 1..k). Rows with
    NULL or non-positive weight are excluded (they never win a race).
    Like ``sample_exact``, draws are prefix-stable: rank <= j is
    exactly the k=j sample.

    Scale shape: a per-row projection followed by a global top-k —
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    NEVER a full sort; the only ordered state is k rows. The final
    rank window runs over those k rows only.

    Float discipline: u and w are exact doubles (integer-derived), and
    ``ln`` comes from Python's libm in one Arrow batch — bit-identical
    to DuckDB's ``ln`` (JVM Math.log is 1 ulp off on some inputs, the
    ``unigram_logprob`` precedent) — so ``-ln(u)/w`` is two correctly-
    rounded ops over identical operands in both engines and the race
    order is bit-exact.
    """
    import math as _math

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    prio = sample_priority_expr(F.col(key_col), salt)
    base = (
        df.select(F.col(key_col), F.col(weight_col).cast("double").alias("weight"))
        .filter(F.col("weight") > 0)
        .withColumn(
            "_u",
            (prio + F.lit(1)).cast("double") / F.lit(float((1 << 32) + 1)),
        )
    )
    _ln = F.pandas_udf(lambda s: s.map(_math.log), "double")
    keyed = base.withColumn("sample_key", -_ln(F.col("_u")) / F.col("weight"))
    top = keyed.orderBy(
        F.col("sample_key").asc(), F.col(key_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("sample_key").asc(), F.col(key_col).asc())
    return top.select(key_col, "weight", "sample_key").withColumn(
        "sample_rank", F.row_number().over(w)
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    pkey: str,
    n_buckets: int = 3,
    rank_buckets_width: int = 1 << 26,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al. 2020
    §4.3): score every document with the corpus's own unigram LM
    (``unigram_logprob``), identify its language, and split EACH
    language's documents into ``n_buckets`` equal NTILE groups by score
    — bucket 1 ('head') is the best-scoring third, 3 ('tail') the
    worst. CCNet keeps head+middle and drops (or down-samples) tail;
    the caller filters on ``ppl_bucket``.

    Output: (pkey, lang, n_words, mean_logprob, bucket, ppl_bucket);
    zero-word docs are absent (they have no score).

    Scale shape — a distributed per-language rank, NOT a per-language
    window: ``Window.partitionBy(lang)`` collapses each language onto
    ONE task, and a 100-TB crawl has a handful of languages. Instead
    the nano-log score axis is chopped into deterministic contiguous
    ranges (``floor(score*1e9) div rank_buckets_width`` — data-
    independent integer division, so no sampled boundaries), per-
    (lang, range) counts prefix-sum on the driver (a few hundred rows),
    and the rank window runs per (lang, range). Ties share a double
    score, hence a range — ordering never straddles a boundary. The
    rank -> NTILE bucket map is closed-form BIGINT arithmetic, exact
    against the SQL ``NTILE(n) OVER (PARTITION BY lang ORDER BY score
    DESC, pkey)`` oracle.
    """
    from pg_vectorize_spark.functions.text import lang_id_expr

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    scored = unigram_logprob(df, text_col, pkey).join(
        df.select(F.col(pkey), lang_id_expr(F.col(text_col)).alias("lang")),
        pkey,
    )
    # deterministic contiguous ranges of the (descending) score order:
    # negate the nano-score so range id ASC == score DESC
    q9 = F.floor(F.col("mean_logprob") * F.lit(float(LOGPROB_SCALE))).cast(
        "long"
    )
    base = scored.withColumn("_q9", q9).withColumn(
        "_rid", F.expr(f"(-_q9) div {rank_buckets_width}")
    # r13 optimization round: base is consumed TWICE (the per-range count
    # collect below and the ranked output join) — without a
    # materialization point the ENTIRE unigram-LM pipeline (words
    # explode, vocab aggregate, scoring join) plus the lang-id scan runs
    # twice. The frame is one narrow row per doc (§2.4).
    ).localCheckpoint(eager=False)
    counts = sorted(
        ((r["lang"], r["_rid"]), r["_n"])
        for r in base.groupBy("lang", "_rid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    offsets, totals, running = [], {}, {}
    for (lang, rid), n in counts:
        offsets.append((lang, rid, running.get(lang, 0)))
        running[lang] = running.get(lang, 0) + n
    totals = running
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(l, r, o, totals[l]) for l, r, o in offsets],
        schema="lang STRING, _rid BIGINT, _roff BIGINT, _nlang BIGINT",
    )
    w = Window.partitionBy("lang", "_rid").orderBy(
        F.col("mean_logprob").desc(), F.col(pkey).asc()
    )
    ranked = base.join(F.broadcast(off_df), ["lang", "_rid"]).withColumn(
        "_rank", F.col("_roff") + F.row_number().over(w)
    )
    # closed-form NTILE(k): q = n div k rows per tile, the first
    # r = n % k tiles take one extra row; integer ceil(a/b) is
    # (a + b - 1) div b. All BIGINT, so the comparison against the SQL
    # NTILE oracle is exact. The ELSE branch's div-by-zero when q = 0
    # (fewer rows than tiles) is unreachable: rank <= n = r there.
    k = n_buckets
    bucket = F.expr(
        f"""CASE
          WHEN _rank <= (_nlang % {k}) * ((_nlang div {k}) + 1)
          THEN (_rank + (_nlang div {k})) div ((_nlang div {k}) + 1)
          ELSE (_nlang % {k})
               + ((_rank - (_nlang % {k}) * ((_nlang div {k}) + 1)
                   + (_nlang div {k}) - 1) div (_nlang div {k}))
        END"""
    ).cast("int")
    label = (
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        if n_buckets >= 2
        else F.lit("head")
    )
    return ranked.select(
        pkey,
        "lang",
        "n_words",
        "mean_logprob",
        bucket.alias("bucket"),
        label.alias("ppl_bucket"),
    )


def unimax_budgets(
    lang_tokens: list[tuple[str, int]],
    total_budget: int,
    max_epochs: float = 4.0,
) -> dict[str, float]:
    """UniMax budget waterfilling (Chung et al. 2023): distribute a
    total token budget over languages as uniformly as possible, capping
    every language at ``max_epochs`` passes over its own corpus.

    Languages ascending by corpus size: if spreading the remaining
    budget uniformly over the remaining languages would exceed a
    language's epoch cap, it gets ``max_epochs * corpus`` and the rest
    re-spreads; otherwise every remaining language gets the uniform
    share. Returns epochs per language (budget_l / corpus_l). Pure
    driver arithmetic over one tiny per-language row set — the sampling
    itself is ``unimax_sample``.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    sized = sorted(
        ((lang, int(n)) for lang, n in lang_tokens if n > 0),
        key=lambda x: (x[1], x[0]),
    )
    epochs: dict[str, float] = {}
    remaining_budget = float(total_budget)
    remaining = len(sized)
    for lang, n in sized:
        uniform = remaining_budget / remaining
        alloc = min(uniform, max_epochs * n)
        epochs[lang] = alloc / n
        remaining_budget -= alloc
        remaining -= 1
    return epochs


def unimax_sample(
    df: DataFrame,
    key_col: str,
    lang_col: str,
    count_col: str,
    total_budget: int,
    max_epochs: float = 4.0,
    salt: str = "|unimax",
) -> DataFrame:
    """Materialize a UniMax-sampled corpus: each document appears
    ``floor(epochs_lang)`` times plus one more with probability
    ``frac(epochs_lang)`` — deterministic per (doc, copy, salt), so the
    mix is reproducible across reruns, cluster sizes and partitionings
    (same discipline as ``hash_split``).

    Output: one row per kept copy — (key, lang, n_tokens, copy) with
    copy in [0, ceil(epochs)). Expected kept tokens per language equal
    the language's UniMax budget; the realized count concentrates
    tightly around it (per-doc independent coin for the fractional
    epoch only).

    Scale shape: one tiny per-language aggregate (collected — bounded
    by the language inventory), broadcast epochs join, then a generator
    explode of at most ceil(epochs) copies per row and a per-row hash
    coin — no shuffle beyond the aggregate, linear in output size.
    """
    totals = [
        (r["l"], r["n"])
        for r in df.groupBy(F.col(lang_col).alias("l"))
        .agg(F.sum(F.col(count_col).cast("long")).alias("n"))
        .collect()
    ]
    epochs = unimax_budgets(totals, total_budget, max_epochs)
    if not epochs:
        return df.select(
            F.col(key_col),
            F.col(lang_col),
            F.col(count_col).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("copy"),
        ).limit(0)
    spark = df.sparkSession
    eps = spark.createDataFrame(
        [(lang, e) for lang, e in epochs.items()],
        schema=f"{lang_col} STRING, _epochs DOUBLE",
    )
    base = df.select(
        F.col(key_col),
        F.col(lang_col),
        F.col(count_col).cast("long").alias("n_tokens"),
    ).join(F.broadcast(eps), lang_col)
    full = F.floor(F.col("_epochs")).cast("long")
    frac = F.col("_epochs") - full.cast("double")
    copies = base.withColumn(
        "copy", F.explode(F.sequence(F.lit(0).cast("long"), full))
    )
    # copy < floor(epochs): always kept; copy == floor(epochs): kept
    # with probability frac via the deterministic per-(doc, copy) coin
    coin = sample_priority_expr(
        F.concat_ws("#", F.col(key_col).cast("string"), F.col("copy")),
        salt,
    ).cast("double") / F.lit(float(1 << MIX_BITS))
    kept = copies.filter((F.col("copy") < full) | (coin < frac))
    return kept.select(key_col, lang_col, "n_tokens", "copy")
