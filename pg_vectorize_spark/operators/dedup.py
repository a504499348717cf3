"""Deduplication operators for training-data pipelines.

Not present in the reference (its only dedup is the hybrid-merge HashMap,
extension/src/search.rs:302-336) — these are first-class engine extensions
for 100-TB corpus curation:

- ``exact_dedup`` — hash-groupBy on content (or its fingerprint);
- ``ngram_jaccard_pairs`` — EXACT word-shingle Jaccard via an inverted
  index: explode shingles -> self-join on shingle -> per-pair intersection
  counts. Never materializes the n² pair space: only pairs sharing >= 1
  shingle appear, which is what makes it viable at scale;
- ``minhash_signatures`` / ``minhash_lsh_candidates`` — MinHash + banded
  LSH: signature via ``min((a_i * x + b_i) mod P)`` over shingle integer
  encodings (polynomial-roll hash, same family as the embedder, so the
  whole chain is SQL-expressible and oracle-checkable). Band keys ->
  candidate pairs sharing any band;
- ``simhash_expr`` / ``simhash_pairs`` — bitwise majority fingerprint +
  hamming-distance pairs via ``bit_count(xor)``;
- ``cosine_neardup_pairs`` — embedding near-duplicate pairs above a cosine
  threshold (brute-force; compose with the ANN bucketing in operators/ann.py
  to prune candidates at scale).

All dimension constants (num_hashes, bands, bit widths) are deterministic;
hash mixing constants a_i = 2i+3, b_i = 5i+7 over prime P keep every stage
reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pg_vectorize_spark.functions.vector import cosine_similarity
from pg_vectorize_spark.operators.skew import ensure_min_partitions
from pg_vectorize_spark.providers.local import HASH_MOD, HASH_MULT, HASH_SEED

MINHASH_PRIME = 999_983  # largest prime < 1e6; shingle codes are < 1_000_003


def poly_hash_expr(s: Column) -> Column:
    """Polynomial-roll string hash (shared spec with providers/local.bucket)."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(HASH_SEED).cast("long"),
        lambda acc, ch: (acc * HASH_MULT + F.ascii(ch)) % HASH_MOD,
    )


def exact_dedup(df: DataFrame, content_col: str, pkey: str) -> DataFrame:
    """Exact dedup: (keep_id = min pkey, n_copies) per distinct content."""
    return (
        df.groupBy(content_col)
        .agg(
            F.min(pkey).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def shingles_exploded(
    df: DataFrame,
    text_col: str,
    pkey: str,
    k: int = 3,
    unicode: bool = False,
) -> DataFrame:
    """Distinct k-word shingles as rows: (_id, _sh).

    Built as explode(word_shingles_expr) — the zip_with k-gram chain
    evaluates the word array a constant number of times per doc (never per
    gram), runs entirely row-local (NO shuffle; the previous windowed-lead
    build shuffled every word row on _id and needed a global distinct —
    two exchanges this shape deletes, measured 0.81s vs 1.04s at sf0.1
    before even counting the saved distinct), and array_distinct per doc
    already guarantees (_id, _sh) uniqueness because each doc is one input
    row. Docs with < k words fall back to one whole-text shingle (spec
    parity with the oracle's sql_word_shingles).
    """
    from pg_vectorize_spark.functions.text import word_shingles_expr

    # Small-input parallelism guard: with no shuffle in this build, the
    # downstream per-shingle hashing inherits the scan's partitioning
    # (see skew.ensure_min_partitions).
    df = ensure_min_partitions(df, pin=False)  # batch corpus path (ADVICE r13)
    return df.select(
        F.col(pkey).alias("_id"),
        F.explode(
            word_shingles_expr(F.col(text_col), k, unicode=unicode)
        ).alias("_sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    pkey: str,
    k: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Shingle-Jaccard pairs >= threshold via inverted index.

    Output: (a_id, b_id, jaccard) with a_id < b_id. Scale shape: the
    shingle self-join shuffles on the shingle key; a hot shingle
    (boilerplate text) fans out quadratically in one reducer, so
    ``max_shingle_df`` drops shingles whose document frequency exceeds the
    cap BEFORE the join — the standard stop-shingle treatment (bounds the
    worst reducer at max_shingle_df², and near-ubiquitous shingles carry
    no dedup signal anyway). The capped Jaccard is computed over the
    filtered shingle sets on BOTH the numerator and denominator, so it
    remains a true Jaccard of the reduced sets. ``None`` = exact.
    """
    if max_shingle_df is None:
        # r13 optimization round: with no df cap the per-doc set size IS
        # the (already-distinct) shingle array's length, knowable IN-ROW
        # at explode time — the windowed form below shuffled the whole
        # posting table on _id just to attach it (one full Exchange of
        # the largest pre-pair frame, deleted here; §2.4). The shingle
        # array is projected once (multi-referenced non-cheap exprs are
        # not inlined by CollapseProject), sized, then exploded.
        from pg_vectorize_spark.functions.text import word_shingles_expr

        arr = (
            ensure_min_partitions(df, pin=False)  # batch corpus path
            .select(
                F.col(pkey).alias("_id"),
                word_shingles_expr(F.col(text_col), k).alias("_arr"),
            )
        )
        inv_sized = arr.select(
            "_id",
            F.size("_arr").alias("_size"),
            F.explode("_arr").alias("_sh"),
        ).localCheckpoint(eager=False)
    else:
        # the inverted index is read 3-4x downstream (df-count, both
        # join sides, sizes); it is itself a windowed explode, so
        # materialize it once with a lazy local checkpoint instead of
        # recomputing per consumer
        inv = shingles_exploded(df, text_col, pkey, k).localCheckpoint(
            eager=False
        )
        hot = (
            inv.groupBy("_sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("_sh")
        )
        # the hot list is tiny by construction -> broadcast anti-join,
        # no extra shuffle of the full inverted index
        inv = inv.join(F.broadcast(hot), "_sh", "left_anti")
        # attach the CAPPED per-doc set size to every posting with a
        # window over _id, so it rides the shingle self-join and the
        # pair aggregate needs NO size join afterwards. The pair table
        # is the largest frame in this pipeline (4.3x the inverted index
        # at sf0.1) — joining sizes onto it, as a first cut did,
        # re-shuffles it twice; at a scale where per-doc sizes stop
        # being broadcastable (1e9 docs) that is the dominant cost. One
        # extra exchange of the index is strictly smaller, and the
        # self-join's two reads reuse it (ReusedExchange).
        inv_sized = inv.withColumn(
            "_size", F.count(F.lit(1)).over(Window.partitionBy("_id"))
        )
    a = inv_sized.select(
        F.col("_id").alias("a_id"), "_sh", F.col("_size").alias("_sa")
    )
    b = inv_sized.select(
        F.col("_id").alias("b_id"), "_sh", F.col("_size").alias("_sb")
    )
    inter = (
        a.join(b, "_sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).alias("_inter"),
            F.min("_sa").alias("_sa"),
            F.min("_sb").alias("_sb"),
        )
    )
    jac = inter.select(
        "a_id",
        "b_id",
        (
            F.col("_inter").cast("double")
            / (F.col("_sa") + F.col("_sb") - F.col("_inter")).cast("double")
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    return jac.select("a_id", "b_id", F.col("jaccard"))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    pkey: str,
    num_hashes: int = 16,
    k: int = 3,
    unicode: bool = False,
) -> DataFrame:
    """(pkey, signature array<long>[num_hashes]) — min over shingle codes of
    (a_i * code + b_i) mod P, a_i = 2i+3, b_i = 5i+7.

    Implemented as explode -> per-hash min aggregation (one shuffle on pkey,
    map-side partial mins) rather than a per-row higher-order expression:
    interpreted HOFs would recompute the shingle-code list num_hashes times
    per row, and the groupBy form is also the one that scales — min() is
    algebraic, so executors combine locally before the exchange.
    """
    codes = shingles_exploded(df, text_col, pkey, k, unicode=unicode).select(
        "_id", poly_hash_expr(F.col("_sh")).alias("_code")
    )
    mins = codes.groupBy("_id").agg(
        *[
            F.min(
                ((2 * i + 3) * F.col("_code") + (5 * i + 7)) % MINHASH_PRIME
            ).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "_id",
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
    )


def _band_rows(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(_id, band, band_key) — one row per (doc, band), key = the band's
    signature slice rendered as comma-joined text."""
    return signatures.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(
                            F.col("signature"),
                            b * rows_per_band + 1,
                            rows_per_band,
                        ),
                        lambda x: x.cast("string"),
                    ),
                ),
            )
        ).alias("band", "band_key"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    collapse_identical: bool = True,
    neighbor_chain: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing at least one LSH band.

    Band key = (band_index, the band's signature slice rendered as text).
    Output: distinct (a_id, b_id), a_id < b_id. The band join is the
    cross-bucket scale mechanism: only same-bucket pairs are generated.

    ``collapse_identical`` (default ON) is the WITHIN-bucket bound for
    duplicate clusters: docs with IDENTICAL signatures are grouped first
    and contribute (a) one star edge per non-representative member
    (rep = min id, so rep < member) and (b) band-join pairs among the
    representatives only. A real crawl's duplicate cluster (10^5-10^6
    byte-identical pages sharing every band) costs n-1 star edges
    instead of ~n^2/2 same-bucket pairs. The collapsed pair set is a
    SUBSET of the uncapped one, and is EXACTLY equivalent for every
    downstream consumer in this repo, all of which reduce pairs to
    "b_id has a smaller near-dup neighbor at estimate >= tau" or to
    connected components:

    * star edges have est_jaccard = 1.0 (identical signatures agree on
      every component), so members are dropped at any tau <= 1;
    * for any uncapped pair (x, y), x < y, with est e and a shared
      band: rep(x) <= x < y carries x's exact signature, so the
      rep-level pair (rep(x), rep(y)) shares the same bands and the
      same estimate — the "exists a smaller neighbor at >= tau"
      predicate and the component structure are preserved verbatim
      (proof mirrored in tests/test_dedup_cluster_bound.py against an
      adversarial 1k-member cluster).

    ``neighbor_chain`` (opt-in, int k) additionally bounds buckets that
    are hot with DISTINCT signatures: within each (band, band_key)
    bucket, each doc pairs only with its k id-sorted successors
    (sorted-neighbor chaining — linear pairs per bucket). UNLIKE the
    collapse this is approximate under downstream Jaccard thresholding
    (a chain link below tau can disconnect a pair above tau), so it is
    OFF by default; closure-without-threshold connectivity is preserved
    for any k >= 1. The chain applies after the collapse when both are
    enabled.
    """
    if collapse_identical:
        grp = signatures.groupBy("signature").agg(F.min("_id").alias("_rep"))
        # star edges: rep -> each non-rep member (rep is the group min,
        # so a_id < b_id holds by construction). One shuffle on the
        # 16-long signature key; min() is algebraic, so a 10^6-member
        # cluster combines map-side and never concentrates in one task.
        star = (
            signatures.join(grp, "signature")
            .filter(F.col("_id") != F.col("_rep"))
            .select(F.col("_rep").alias("a_id"), F.col("_id").alias("b_id"))
        )
        rep_sigs = grp.select(F.col("_rep").alias("_id"), "signature")
        band_rows = _band_rows(rep_sigs, bands, rows_per_band)
    else:
        star = None
        band_rows = _band_rows(signatures, bands, rows_per_band)

    if neighbor_chain is not None:
        if neighbor_chain < 1:
            raise ValueError("neighbor_chain must be >= 1")
        w = (
            Window.partitionBy("band", "band_key").orderBy("_id")
        )
        succ = F.array(
            *[F.lead("_id", j).over(w) for j in range(1, neighbor_chain + 1)]
        )
        # window exprs must resolve in their own projection before the
        # explode (a Generate operator can't host window functions)
        with_succ = band_rows.select(
            F.col("_id").alias("a_id"), succ.alias("_succ")
        )
        pairs = (
            with_succ.select(
                "a_id",
                F.explode(
                    F.filter(F.col("_succ"), lambda x: x.isNotNull())
                ).alias("b_id"),
            )
            .distinct()
        )
    else:
        a = band_rows.select(F.col("_id").alias("a_id"), "band", "band_key")
        b = band_rows.select(F.col("_id").alias("b_id"), "band", "band_key")
        pairs = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
        )
    if star is None:
        return pairs
    # star and rep-level pairs are disjoint (a star edge pairs a rep
    # with a non-rep; rep pairs pair two reps), so a plain union —
    # no cross-set distinct shuffle.
    return pairs.unionByName(star)


def minhash_jaccard_estimate(
    signatures: DataFrame,
    pairs: DataFrame,
    num_hashes: int = 16,
) -> DataFrame:
    """Estimated Jaccard for candidate pairs: the fraction of agreeing
    signature components (the MinHash estimator E[agree/k] = J).

    This is the VERIFY stage of the LSH pipeline: band candidates are
    recall-oriented; thresholding on the estimate gives precision without
    ever touching the raw shingle sets — at scale the signatures are
    k*8 bytes per doc vs unbounded shingle lists, so the verify join
    moves tiny rows. Input: signatures (_id, signature), pairs
    (a_id, b_id). Output: (a_id, b_id, est_jaccard).
    """
    sa = signatures.select(
        F.col("_id").alias("a_id"), F.col("signature").alias("_siga")
    )
    sb = signatures.select(
        F.col("_id").alias("b_id"), F.col("signature").alias("_sigb")
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_siga"), F.col("_sigb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            (agree.cast("double") / float(num_hashes)).alias("est_jaccard"),
        )
    )


def simhash_expr(text: Column, bits: int = 20) -> Column:
    """SimHash fingerprint: bit j set iff Σ_tokens sign((hash(tok)>>j)&1)>0.

    Uses distinct word tokens (weight 1 each) and the polynomial hash; the
    whole expression is two nested transforms + a fold — SQL-expressible.
    """
    words = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+"),
            lambda x: x != "",
        )
    )
    hashes = F.transform(words, lambda w: poly_hash_expr(w))

    # ONE fold over the token hashes carrying a bits-wide votes array —
    # NOT an aggregate over sequence(0, bits-1) referencing ``hashes``
    # from inside: higher-order expressions are interpreted, and a
    # computed array referenced inside a per-index lambda re-evaluates
    # the whole token-hash transform once PER BIT (a bits-x blowup
    # measured on the sf0.1 gate). Inside the fold only the element
    # long ``h`` is touched per bit. Bit extraction stays arithmetic
    # (floor(h / 2^j) % 2): the shift builtins take literal shift
    # amounts, not lambda columns; 2^j as double is exact for j < 53,
    # and h < 2^20 here. The integer votes/fingerprint values are
    # identical to the per-bit-aggregate form (pure reassociation of
    # integer sums), so oracle parity is unaffected.
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda j: F.when(
                    F.floor(
                        h.cast("double") / F.pow(F.lit(2.0), j.cast("double"))
                    ).cast("long")
                    % 2
                    == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda a, s: a + s,
        ),
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    pkey: str,
    bits: int = 20,
    max_hamming: int = 3,
    collapse_identical: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming — EXACT, banded.

    Pigeonhole banding: the fingerprint is split into ``max_hamming + 1``
    contiguous bit bands; two fingerprints within hamming distance
    ``max_hamming`` must agree EXACTLY on at least one band, so an
    equi-join on (band_index, band_value) generates every qualifying pair
    (plus false candidates the exact hamming re-check drops). Same result
    set as the n² compare, but the shuffle is a hash join on band keys —
    the 100-TB shape. Candidate fan-out is bounded by per-band bucket
    sizes (2^(bits/(max_hamming+1)) buckets per band).

    ``collapse_identical`` (default ON) bounds the within-bucket blowup
    of duplicate clusters exactly as in ``minhash_lsh_candidates``:
    docs with IDENTICAL fingerprints collapse to one representative
    (min id) before banding; members attach via star edges at
    hamming = 0 (always <= max_hamming), and cross-group pairs keep
    their exact hamming because hamming(x, y) = hamming(rep(x), rep(y))
    when fingerprints are equal within groups. Drop-the-larger-id and
    closure consumers see identical results; a 10^6-page identical
    cluster costs n-1 edges instead of ~n^2/2.
    """
    n_bands = max_hamming + 1
    # Materialize the (id, fingerprint) frame ONCE: the simhash is an
    # interpreted higher-order expression (20 aggregate passes over the
    # token hashes per doc), and without the checkpoint CollapseProject
    # inlines it into every band expression on BOTH join sides —
    # re-evaluating the text hashing ~10x. The frame is two narrow
    # columns; measured 25.6 s -> ~3 s on the sf0.1 gate.
    sh = df.select(
        F.col(pkey).alias("_id"), simhash_expr(F.col(text_col), bits).alias("_sh")
    ).localCheckpoint(eager=False)
    star = None
    if collapse_identical:
        grp = sh.groupBy("_sh").agg(F.min("_id").alias("_rep"))
        star = (
            sh.join(grp, "_sh")
            .filter(F.col("_id") != F.col("_rep"))
            .select(
                F.col("_rep").alias("a_id"),
                F.col("_id").alias("b_id"),
                F.lit(0).cast("int").alias("hamming"),
            )
        )
        sh = grp.select(F.col("_rep").alias("_id"), "_sh")
    base_w, rem = divmod(bits, n_bands)
    band_exprs = []
    lo = 0
    for i in range(n_bands):
        width = base_w + (1 if i < rem else 0)
        mask = (1 << width) - 1
        band_exprs.append(
            F.shiftright(F.col("_sh"), lo).bitwiseAND(F.lit(mask))
        )
        lo += width
    banded = sh.select(
        "_id", "_sh", F.posexplode(F.array(*band_exprs)).alias("_band", "_bval")
    )
    a = banded.select(
        F.col("_id").alias("a_id"), F.col("_sh").alias("_sha"), "_band", "_bval"
    )
    b = banded.select(
        F.col("_id").alias("b_id"), F.col("_sh").alias("_shb"), "_band", "_bval"
    )
    # A pair may agree on several bands; keep ONLY the row whose band is
    # the FIRST agreeing band — recomputed from the two fingerprints with
    # bitwise ops, so dedup is a map-side filter instead of a .distinct()
    # over the full pair output (on duplicate-heavy corpora the pair set
    # is millions of rows — the distinct's 3-column shuffle+agg was the
    # single widest exchange of this job; measured vs identical output).
    band_bounds = []
    lo = 0
    for i in range(n_bands):
        width = base_w + (1 if i < rem else 0)
        band_bounds.append((lo, (1 << width) - 1))
        lo += width

    def _agree(i: int):
        blo, bmask = band_bounds[i]
        return F.shiftright(F.col("_sha"), blo).bitwiseAND(
            F.lit(bmask)
        ) == F.shiftright(F.col("_shb"), blo).bitwiseAND(F.lit(bmask))

    first_band = F.when(F.col("_band") == 0, F.lit(True))
    for i in range(1, n_bands):
        no_earlier = ~_agree(0)
        for j in range(1, i):
            no_earlier = no_earlier & ~_agree(j)
        first_band = first_band.when(F.col("_band") == i, no_earlier)
    pairs = (
        a.join(b, ["_band", "_bval"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(first_band.otherwise(F.lit(False)))
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if star is None:
        return pairs
    # disjoint sets (star pairs a rep with a member; band pairs pair
    # two reps) — plain union, no extra distinct.
    return pairs.unionByName(star)


#: cosine_neardup_pairs refuses inputs above this many rows unless the
#: caller passes allow_quadratic=True — an n² crossJoin on a real corpus is
#: never what a pipeline user meant.
QUADRATIC_ROW_GUARD = 100_000


def cosine_neardup_pairs(
    emb_df: DataFrame,
    pkey: str,
    emb_col: str,
    threshold: float = 0.9,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, a_id < b_id.

    EXACT n² compare — the verification baseline for the bucketed variant
    below. Only viable on small candidate sets (a single IVF cell, a
    post-LSH bucket); at corpus scale use ``cosine_neardup_pairs_bucketed``.
    Guarded: inputs over ``QUADRATIC_ROW_GUARD`` rows raise unless
    ``allow_quadratic=True`` (the count is a cheap columns-pruned scan next
    to the n² join it prevents).
    """
    if not allow_quadratic:
        n = emb_df.select(pkey).limit(QUADRATIC_ROW_GUARD + 1).count()
        if n > QUADRATIC_ROW_GUARD:
            raise ValueError(
                f"cosine_neardup_pairs is an exact n^2 baseline; input has "
                f">{QUADRATIC_ROW_GUARD} rows. Use "
                "cosine_neardup_pairs_bucketed for corpus-scale near-dup, "
                "or pass allow_quadratic=True if this n^2 is intentional."
            )
    a = emb_df.select(F.col(pkey).alias("a_id"), F.col(emb_col).alias("_va"))
    b = emb_df.select(F.col(pkey).alias("b_id"), F.col(emb_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _pairs_cosine_rescore(
    pairs_df: DataFrame,
    va: str,
    vb: str,
    threshold: float,
    margin: float = 1e-6,
) -> DataFrame:
    """Score candidate pair rows (two vector columns) and keep those at
    cosine >= threshold — as ONE mapInPandas pass: a vectorized float64
    numpy prefilter at ``threshold - margin`` picks survivors, each
    survivor's output value is recomputed with the exact left-to-right
    sequential fold of the ``cosine_similarity`` expression (and the
    DuckDB oracle), so both membership and the emitted cosine are
    bit-identical to the expression path. The interpreted per-pair
    zip_with/aggregate this replaces was the dominant term of bucketed
    near-dup rescoring (candidate count >> output count).

    Runs as ``mapInArrow`` (not mapInPandas): the pandas bridge folds
    NaN into null on the way back to the JVM, losing the NaN scores the
    expression path emits for NaN embeddings; Arrow round-trips NaN
    bit-exactly. Degenerate rows (null vectors, null elements, ragged
    pairs) take a per-row path implementing the exact expression
    semantics (see _pair_cosine_spark_semantics).

    Output: the input columns minus the two vector columns, plus
    ``cosine`` (double)."""
    from pyspark.sql import types as T

    keep_fields = [
        f for f in pairs_df.schema.fields if f.name not in (va, vb)
    ]
    out_schema = T.StructType(
        keep_fields + [T.StructField("cosine", T.DoubleType())]
    )
    keep_names = [f.name for f in keep_fields]
    thr = float(threshold)

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            ca = rb.column(names.index(va))
            cb = rb.column(names.index(vb))
            A = _list_matrix(ca)
            B = _list_matrix(cb)
            keep_idx: list[int] = []
            exact: list[float] = []
            if (
                A is not None
                and B is not None
                and A.shape[1] == B.shape[1]
            ):
                dots = np.einsum("ij,ij->i", A, B)
                denom = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
                    np.einsum("ij,ij->i", B, B)
                )
                # mirror Spark's NaN comparisons (see _seq_cosine)
                branch = (denom > 0) | np.isnan(denom)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(
                        branch, dots / np.where(branch, denom, 1.0), 0.0
                    )
                for i in np.nonzero(
                    (cos >= thr - margin) | np.isnan(cos)
                )[0]:
                    c = _seq_cosine(A[i], B[i])
                    if _spark_ge(c, thr):
                        keep_idx.append(int(i))
                        exact.append(c)
            else:
                la, lb = ca.to_pylist(), cb.to_pylist()
                for i in range(rb.num_rows):
                    c = _pair_cosine_spark_semantics(la[i], lb[i])
                    if c is not None and _spark_ge(c, thr):
                        keep_idx.append(i)
                        exact.append(c)
            idx = pa.array(keep_idx, type=pa.int64())
            cols = [rb.column(names.index(k)).take(idx) for k in keep_names]
            cols.append(pa.array(exact, type=pa.float64(), from_pandas=False))
            yield pa.RecordBatch.from_arrays(
                cols, names=keep_names + ["cosine"]
            )

    return pairs_df.mapInArrow(run, out_schema)


def cosine_neardup_pairs_bucketed(
    emb_df: DataFrame,
    pkey: str,
    emb_col: str,
    threshold: float = 0.9,
    nbits: int = 8,
    probe_hamming: int = 1,
    rescore_mode: str = "pandas",
) -> DataFrame:
    """Embedding near-dup pairs via sign-bit LSH candidate pruning.

    Candidates are pairs whose sign-bit buckets (operators/ann.py
    ``signbit_bucket_expr`` over the first ``nbits`` coordinates) differ in
    at most ``probe_hamming`` bits; each candidate is re-scored with the
    exact cosine. Implemented as an equi-join: the b side explodes its
    bucket into the bucket itself plus every <=probe_hamming-bit flip, so
    the join is a plain hash join on the bucket value — no CartesianProduct.

    RECALL is approximate: a true pair with cosine >= threshold whose sign
    bits differ in more than probe_hamming of the first nbits dims is
    missed. For near-duplicates (cosine -> 1) sign patterns agree with high
    probability per dim, and raising probe_hamming trades cost for recall;
    the exact ``cosine_neardup_pairs`` is the ground truth to calibrate
    against on a sample.
    """
    if probe_hamming > 1:
        raise ValueError(
            "probe_hamming > 1 not implemented (variant explosion grows "
            "as C(nbits, r); compose with IVF cells instead)"
        )
    if rescore_mode not in ("pandas", "expr"):
        raise ValueError(f"unknown rescore_mode {rescore_mode!r}")
    from pg_vectorize_spark.operators.ann import signbit_bucket_expr

    base = emb_df.select(
        F.col(pkey).alias("_id"),
        F.col(emb_col).alias("_v"),
        signbit_bucket_expr(F.col(emb_col), nbits).alias("_bkt"),
    )
    a = base.select(
        F.col("_id").alias("a_id"), F.col("_v").alias("_va"), F.col("_bkt")
    )
    variants = [F.col("_bkt")]
    if probe_hamming >= 1:
        variants += [
            F.col("_bkt").bitwiseXOR(F.lit(1 << j)) for j in range(nbits)
        ]
    b = base.select(
        F.col("_id").alias("b_id"),
        F.col("_v").alias("_vb"),
        F.explode(F.array(*variants)).alias("_bkt"),
    )
    # a's real bucket equals exactly one b-variant per (a,b), so the join
    # emits each candidate pair once — no dedup shuffle needed
    cand = a.join(b, "_bkt").filter(F.col("a_id") < F.col("b_id"))
    if rescore_mode == "pandas":
        # vectorized Arrow rescore: exact same survivors and values as
        # the expression path (see _pairs_cosine_rescore docstring;
        # parity pinned in tests/test_dedup.py)
        return _pairs_cosine_rescore(
            cand.select("a_id", "b_id", "_va", "_vb"),
            "_va",
            "_vb",
            float(threshold),
        )
    return cand.select(
        "a_id",
        "b_id",
        cosine_similarity(F.col("_va"), F.col("_vb")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood. Output edges are
    naturally oriented larger -> smaller (v > u >= m)."""
    nbr = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = nbr.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        nbr.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges larger -> smaller, then each node
    re-links its smaller neighbors (and itself) to the smallest of them."""
    e = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    relinked = e.join(m, "u").select(F.col("v").alias("n"), "m")
    selfed = m.select(F.col("u").alias("n"), "m")
    return (
        relinked.unionByName(selfed)
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _alternating_cc(
    edges: DataFrame, max_iterations: int
) -> tuple[DataFrame, int, bool]:
    """Alternate large-star/small-star until the edge set is a star forest
    (every component collapsed onto its minimum). Returns (star_edges
    oriented leaf -> center, rounds_used, converged)."""
    for rounds in range(1, max_iterations + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        # star-forest test — BOTH conditions required:
        # (a) no node is both a leaf (source) and a center (target), i.e.
        #     no 2-hop chain u -> v -> w remains;
        # (b) every leaf has exactly ONE parent. A leaf attached to two
        #     centers (e.g. pairs (1,10),(2,11),(5,10),(5,11) after one
        #     round: {(5,1),(10,1),(5,2),(11,2)}) passes (a) but is NOT a
        #     star forest — stopping there splits the component and emits
        #     duplicate labels for the shared leaf.
        chain = (
            edges.select("v")
            .join(edges.select(F.col("u").alias("v")), "v", "left_semi")
            .limit(1)
            .count()
        )
        multi_parent = (
            edges.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .limit(1)
            .count()
        )
        if chain == 0 and multi_parent == 0:
            return edges, rounds, True
    return edges, max_iterations, False


#: connected_components switches to the driver-side union-find below this
#: many DISTINCT pairs. 500k edge tuples collect in well under a second and
#: union-find them in ~1 s — far below the fixed cost of even one
#: large-star/small-star shuffle round. At corpus scale the distributed
#: path takes over automatically.
CC_LOCAL_MAX_EDGES = 500_000


def _local_cc(rows: list) -> list[tuple]:
    """Union-find closure over collected (u, v) pairs — min-id labels.

    Identical output contract to the distributed path: one (id, component)
    row per node appearing in the input (either side, self-pairs
    included), component = min id reachable. Min comparisons use Python
    ordering, which matches Spark's for integers and for strings (UTF-8
    byte order preserves code-point order, and Python compares code
    points).
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min so the root IS the component label
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 50,
    strict: bool = True,
    local_max_edges: int = CC_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Duplicate-pair transitive closure -> (id, component) with
    component = min id reachable. The step real dedup needs when pairwise
    survivors under-merge chains A~B~C.

    Alternating large-star/small-star (Kiveris et al. 2014): converges in
    O(log^2 n) rounds regardless of component diameter — a 100 TB corpus
    with a million-doc boilerplate chain finishes in a handful of shuffle
    rounds where min-label propagation would need diameter rounds. Each
    round is keyed groupBy + join (no fan-out beyond node degree), with
    localCheckpoint() truncating the growing lineage. SQL can't express
    the fixpoint; pytest verifies against a pure-Python BFS oracle and
    pins the round count on a 200-node chain.

    SMALL-GRAPH FAST PATH: near-dup pair sets are usually tiny relative
    to the corpus (the expensive part is generating them, not closing
    them). When the distinct pair count fits ``local_max_edges`` the
    closure runs as driver-side union-find — exact same labels, zero
    shuffle rounds (bit-parity property-tested in
    tests/test_connected_components.py). Pass ``local_max_edges=0`` to
    force the distributed path. Either way the distinct pair set is
    lazily checkpointed FIRST, so the upstream pair pipeline (often an
    inverted-index join) evaluates once — the previous shape re-ran it
    twice in round 1's neighbor union and once more for the node set.
    """
    base = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = base.filter(F.col("u") != F.col("v"))
    if local_max_edges > 0:
        head = base.limit(local_max_edges + 1).collect()
        if len(head) <= local_max_edges:
            labels = _local_cc([(r["u"], r["v"]) for r in head])
            from pyspark.sql import types as T

            id_type = base.schema["u"].dataType
            spark = pairs.sparkSession
            return spark.createDataFrame(
                labels,
                T.StructType(
                    [
                        T.StructField("id", id_type),
                        T.StructField("component", id_type),
                    ]
                ),
            )
    star, _rounds, converged = _alternating_cc(edges, max_iterations)
    if not converged and strict:
        # silent non-convergence would under-deduplicate (some chains not
        # yet collapsed onto their component minimum)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds; raise max_iterations or pass strict=False to accept "
            "partial labels"
        )
    # star edges are leaf -> center; centers (and any singleton node from a
    # self-pair-only input) label themselves
    all_nodes = (
        base.select(F.col("u").alias("id"))
        .unionByName(base.select(F.col("v").alias("id")))
        .distinct()
    )
    leaf_labels = star.select(F.col("u").alias("id"), F.col("v").alias("component"))
    self_labels = all_nodes.join(
        star.select(F.col("u").alias("id")), "id", "left_anti"
    ).withColumn("component", F.col("id"))
    return leaf_labels.unionByName(self_labels)


def dedup_survivors_transitive(
    df: DataFrame,
    pkey: str,
    pairs: DataFrame,
    max_iterations: int = 50,
    strict: bool = True,
) -> DataFrame:
    """Full transitive dedup: keep only the min-id member of each duplicate
    component (plus every row that appears in no pair). max_iterations /
    strict pass through to connected_components (the escape hatch for
    duplicate chains deeper than the iteration cap)."""
    comps = connected_components(pairs, max_iterations, strict)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(pkey)
    )
    return df.join(losers, pkey, "left_anti")


def dedup_survivors(df: DataFrame, pkey: str, pairs: DataFrame) -> DataFrame:
    """Resolve pairs to survivors: drop every id that appears as the larger
    member of a duplicate pair (connected-component-lite: min-id wins per
    edge; iterate externally for full transitive closure)."""
    losers = pairs.select(F.col("b_id").alias(pkey)).distinct()
    return df.join(losers, pkey, "left_anti")


def duplicated_span_stats(
    df: DataFrame,
    text_col: str,
    pkey: str,
    k: int = 20,
    hash_ngrams: bool = True,
) -> DataFrame:
    """Exact-substring duplication audit: per document, the fraction of its
    k-word windows that also appear verbatim in ANOTHER document — the
    hash-window form of exact substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": suffix
    arrays at 50-token spans; the scalable approximation every corpus
    pipeline uses is fixed-k window hashing, which this implements).

    Output: (pkey, n_windows, n_dup_windows, dup_fraction), one row per
    input document (0/0/0.0 for docs shorter than k words). Cross-doc
    duplication only — a phrase repeated inside a single document does not
    count (that is repetition_score_expr's job).

    Scale shape: explode to (doc, window-key), then three keyed aggregates
    and a semi-join — all hash-partitioned equi-shuffles on the window
    key or the doc key, no pair fan-out (the duplicated-key list is the
    join side, never doc x doc). ``hash_ngrams=True`` shuffles 8-byte
    xxhash64 keys instead of k-word strings (the only path that matters at
    100 TB; collision odds ~n²/2⁶⁴ shift a count by ±1 — irrelevant for an
    audit). The exact string-keyed path (``False``) exists for the
    bit-exact oracle gate.
    """
    from pg_vectorize_spark.functions.text import (
        bind_once_expr,
        raw_words_expr,
        word_ngrams_expr,
    )

    # r13 optimization round: bind the word array once — word_ngrams_expr
    # references it ~2k times (k shifted slices + the length bound each
    # re-ran the regex split in interpreted eval)
    grams = bind_once_expr(
        raw_words_expr(F.col(text_col)),
        lambda ws: word_ngrams_expr(ws, k),
    )
    win = df.select(F.col(pkey), F.explode(grams).alias("gram"))
    if hash_ngrams:
        win = win.select(F.col(pkey), F.xxhash64("gram").alias("gkey"))
    else:
        win = win.select(F.col(pkey), F.col("gram").alias("gkey"))
    # three aggregation subtrees consume the exploded window table; without
    # a materialization point Spark re-tokenizes and re-explodes the whole
    # corpus once per subtree (the dominant cost of this job)
    win = win.localCheckpoint(eager=False)
    totals = win.groupBy(pkey).agg(F.count(F.lit(1)).alias("n_windows"))
    dup_keys = (
        win.distinct()
        .groupBy("gkey")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("gkey")
    )
    dups = (
        win.join(dup_keys, "gkey", "left_semi")
        .groupBy(pkey)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return (
        df.select(F.col(pkey))
        .join(totals, pkey, "left")
        .join(dups, pkey, "left")
        .select(
            F.col(pkey),
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias(
                "n_dup_windows"
            ),
        )
        .withColumn(
            "dup_fraction",
            F.when(
                F.col("n_windows") > 0,
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_jaccard_estimate",
    "simhash_expr",
    "simhash_pairs",
    "cosine_neardup_pairs",
    "cosine_neardup_pairs_bucketed",
    "dedup_survivors",
    "connected_components",
    "dedup_survivors_transitive",
    "duplicated_span_stats",
    "poly_hash_expr",
    "MINHASH_PRIME",
]


def span_instances(
    df: DataFrame,
    text_col: str,
    pkey: str,
    ts_col: str,
    k: int = 20,
    hash_ngrams: bool = True,
) -> DataFrame:
    """(gkey, pkey, _ts, _n_inst) doc-window groups — the tokenize +
    explode + hash pass shared by ``arrival_order_span_stats`` and the
    streaming filter's store fold (the dominant cost of the job; callers
    that need it twice should materialize it once)."""
    from pg_vectorize_spark.functions.text import (
        bind_once_expr,
        raw_words_expr,
        word_ngrams_expr,
    )

    # r13 optimization round: bound word array — see duplicated_span_stats
    grams = bind_once_expr(
        raw_words_expr(F.col(text_col)),
        lambda ws: word_ngrams_expr(ws, k),
    )
    win = df.select(
        F.col(pkey), F.col(ts_col).alias("_ts"), F.explode(grams).alias("gram")
    )
    gkey = (
        F.xxhash64("gram") if hash_ngrams else F.col("gram")
    ).alias("gkey")
    return (
        win.select(F.col(pkey), F.col("_ts"), gkey)
        .groupBy("gkey", pkey, "_ts")
        .agg(F.count(F.lit(1)).alias("_n_inst"))
    )


def arrival_order_span_stats(
    df: DataFrame,
    text_col: str,
    pkey: str,
    ts_col: str,
    k: int = 20,
    hash_ngrams: bool = True,
    prior_windows: DataFrame | None = None,
    instances: DataFrame | None = None,
) -> DataFrame:
    """Ingest-order reading of ``duplicated_span_stats``: per document,
    the fraction of its k-word windows already borne by an
    EARLIER-ARRIVING other document (ordered by ``(ts, pkey)``). The
    first bearer of a span is innocent — the asymmetry an ingest-time
    filter needs (the batch audit flags BOTH copies; at ingest the
    original is already in the corpus and only the replay should drop).

    ``prior_windows`` is an optional (gkey, ts) frame of window keys seen
    BEFORE every row of ``df`` — the streaming filter's persistent store
    (streaming/windows.streaming_dup_span_filter). Store rows outrank
    EVERY in-frame row, regardless of timestamp: they describe documents
    already ingested, and an already-emitted document cannot
    retroactively become the duplicate. (Consequence: a LATE-arriving
    copy — event time before the stored first-seen ts — is still the one
    dropped; arrival order is processing order across batches, event
    time within a batch.)

    Output: (pkey, ts, n_windows, n_dup_windows, dup_fraction), one row
    per input document (0/0/0.0 for docs shorter than k words).

    ``instances`` lets a caller that already materialized
    ``span_instances(df, ...)`` (the streaming filter reuses it for the
    store fold) pass it in instead of re-tokenizing the corpus.

    Scale shape: explode to (doc, window-key) instances, one keyed
    aggregate to doc-window groups, ONE window function partitioned by
    the window key (each gkey group is tiny — the docs sharing that exact
    k-gram), then keyed aggregates back to docs. All equi-shuffles on
    gkey or pkey; no pair fan-out.
    """
    inst = (
        instances
        if instances is not None
        else span_instances(df, text_col, pkey, ts_col, k, hash_ngrams)
    )
    cand = inst.withColumn("_prio", F.lit(1))
    if prior_windows is not None:
        prior = prior_windows.select(
            F.col("gkey"),
            F.lit(None).cast(inst.schema[pkey].dataType).alias(pkey),
            F.col("ts").alias("_ts"),
            F.lit(0).cast("long").alias("_n_inst"),
            F.lit(0).alias("_prio"),
        )
        cand = cand.unionByName(prior)
    # first bearer per window key: store rows (_prio 0) rank before ALL
    # in-frame rows — already-ingested docs cannot become the dup — then
    # event time + pkey order within the frame
    w = Window.partitionBy("gkey").orderBy(
        F.col("_prio").asc(), F.col("_ts").asc(), F.col(pkey).asc_nulls_first()
    )
    ranked = cand.withColumn("_rn", F.row_number().over(w))
    dups = (
        ranked.filter((F.col("_rn") > 1) & F.col(pkey).isNotNull())
        .groupBy(pkey)
        .agg(F.sum("_n_inst").alias("n_dup_windows"))
    )
    totals = inst.groupBy(pkey).agg(F.sum("_n_inst").alias("n_windows"))
    return (
        df.select(F.col(pkey), F.col(ts_col).alias("ts"))
        .join(totals, pkey, "left")
        .join(dups, pkey, "left")
        .select(
            F.col(pkey),
            F.col("ts"),
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias(
                "n_dup_windows"
            ),
            F.when(
                F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
                F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("double")
                / F.col("n_windows").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def _seq_cosine(a, b) -> float:
    """Exact mirror of functions/vector.cosine_similarity: float64
    left-to-right folds for dot and both norms, zero denominator -> 0.0.
    Used to settle GEMM-prefiltered candidates bit-exactly.

    NaN mirror: Spark SQL treats NaN as greater than every value in
    comparisons, so the expression's ``when(denom > 0)`` takes the
    division branch on a NaN denominator and the caller's
    ``cosine >= threshold`` filter KEEPS a NaN score. Python's
    ``denom > 0`` is False for NaN — hence the explicit isnan branch
    here, and callers must treat a NaN return as passing the
    threshold (see _spark_ge)."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    denom = math.sqrt(na) * math.sqrt(nb)
    if denom > 0 or math.isnan(denom):
        return dot / denom
    return 0.0


def _spark_ge(value: float, threshold: float) -> bool:
    """``value >= threshold`` under Spark SQL comparison semantics:
    NaN compares greater than everything (so it always passes)."""
    import math

    return math.isnan(value) or value >= threshold


def _pair_cosine_spark_semantics(a, b) -> float | None:
    """Cosine of one (possibly degenerate) pair under the EXACT semantics
    of the ``cosine_similarity`` expression, derived term by term from
    ``when(denom > 0, dot/denom).otherwise(0.0)``:

    - a NULL vector or any NULL element makes the corresponding norm
      NULL, so ``denom`` is NULL, the ``when`` condition is unknown and
      the OTHERWISE branch yields **0.0**;
    - mismatched lengths with otherwise-clean vectors: ``zip_with`` pads
      the shorter side with NULLs, the dot folds to NULL while both
      norms stay valid, so ``denom > 0`` is true and the branch VALUE is
      **NULL** — the pair is dropped by any comparison filter (returned
      as ``None`` here);
    - NaN anywhere propagates to a **NaN** score, and Spark comparisons
      treat NaN as greater than everything, so the pair passes the
      threshold filter.
    """
    if a is None or b is None:
        return 0.0
    if any(x is None for x in a) or any(x is None for x in b):
        return 0.0
    if len(a) != len(b):
        return None
    return _seq_cosine(a, b)


def _list_matrix(arr):
    """(n, d) float64 matrix from a pyarrow list array when every row is
    non-null, element-null-free, and the same length; None otherwise
    (callers fall back to the exact per-row path)."""
    import numpy as np
    import pyarrow as pa

    if not isinstance(arr, (pa.ListArray, pa.LargeListArray)):
        return None
    if arr.null_count or arr.values.null_count:
        return None
    offs = np.asarray(arr.offsets)
    lens = np.diff(offs)
    if len(lens) == 0:
        return None
    d = lens[0]
    if d == 0 or not (lens == d).all():
        return None
    vals = np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    return vals[offs[0] : offs[-1]].reshape(len(lens), d)


def _cell_dedup_gemm(
    assigned: DataFrame, pkey: str, emb_col: str, threshold: float
) -> DataFrame:
    """Cell-local near-dup marking as one applyInArrow: GEMM prefilter at
    ``threshold - margin``, exact sequential-fold rescore of candidates.
    Arrow (not pandas) so degenerate inputs keep the join path's exact
    semantics: NaN embeddings mark like Spark's NaN-passes-filter rule,
    null-element vectors score 0.0, ragged pairs drop (see
    _pair_cosine_spark_semantics) — the pandas bridge would conflate
    null and NaN on the way in. Output: (pkey, cell, is_dup) for every
    input row."""
    from pyspark.sql import types as T

    margin = 1e-6
    thr = float(threshold)
    out_schema = T.StructType(
        [
            T.StructField(pkey, assigned.schema[pkey].dataType),
            T.StructField("cell", assigned.schema["cell"].dataType),
            T.StructField("is_dup", T.BooleanType()),
        ]
    )

    def mark(tbl):
        import numpy as np
        import pyarrow as pa

        m = tbl.num_rows
        keys = np.asarray(tbl.column(pkey).to_pandas())
        # sort by key ascending so "has a lower-key neighbor" is the
        # strict lower triangle (duplicate keys — not lower — excluded)
        order = np.argsort(keys, kind="mergesort")
        tbl = tbl.take(pa.array(order, type=pa.int64()))
        keys = keys[order]
        emb = tbl.column(emb_col).combine_chunks()
        is_dup = np.zeros(m, dtype=bool)
        E = _list_matrix(emb)
        if E is not None:
            # ROW-BLOCKED GEMM: the full m x m similarity matrix is
            # O(cell²) memory — ~5 GB for a 25k-row cell (a fixed-k
            # config on a grown corpus reaches that silently). Blocks
            # bound it at block x m while computing the identical
            # candidate set; at gate cell sizes one block covers the
            # whole cell.
            block = 1024
            norms = np.sqrt((E * E).sum(axis=1))
            if keys.dtype == object:
                key_neq = lambda rows: np.not_equal.outer(keys[rows], keys)  # noqa: E731
            else:
                key_neq = lambda rows: keys[rows, None] != keys[None, :]  # noqa: E731
            col_idx = np.arange(m)
            for lo in range(0, m, block):
                hi = min(lo + block, m)
                rows = np.arange(lo, hi)
                denom = np.outer(norms[lo:hi], norms)
                # Spark's when(denom > 0) is TRUE for NaN denominators
                # and its >= filter passes NaN scores — mirror both
                branch = (denom > 0) | np.isnan(denom)
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = np.where(
                        branch,
                        (E[lo:hi] @ E.T) / np.where(branch, denom, 1.0),
                        0.0,
                    )
                cand = ((S >= thr - margin) | np.isnan(S)) & (
                    col_idx[None, :] < rows[:, None]
                )
                cand &= key_neq(rows)
                for i_loc, j in zip(*np.nonzero(cand)):
                    i = lo + int(i_loc)
                    if is_dup[i]:
                        continue
                    if _spark_ge(_seq_cosine(E[i], E[j]), thr):
                        is_dup[i] = True
        else:
            # degenerate cell (null vector / null element / ragged):
            # exact per-pair loop under the expression semantics
            vecs = emb.to_pylist()
            for i in range(m):
                for j in range(i):
                    if keys[j] == keys[i]:
                        continue
                    c = _pair_cosine_spark_semantics(vecs[i], vecs[j])
                    if c is not None and _spark_ge(c, thr):
                        is_dup[i] = True
                        break
        return pa.table(
            {
                pkey: tbl.column(pkey),
                "cell": tbl.column("cell"),
                "is_dup": pa.array(is_dup),
            }
        )

    return assigned.groupBy("cell").applyInArrow(mark, out_schema)


def semantic_cluster_dedup(
    emb_df: DataFrame,
    pkey: str,
    emb_col: str,
    centroids_df: DataFrame | None = None,
    threshold: float = 0.9,
    target_cell_size: int = 256,
    seed: int = 42,
    pair_mode: str = "gemm",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with a coarse quantizer,
    then mark within-cluster near-duplicates — a row is a duplicate when
    a LOWER-key row in the SAME cluster sits at cosine >= ``threshold``
    (the paper keeps one representative per epsilon-ball; lowest-key-
    survives is the deterministic analog of its random choice).

    Chain-removal semantics (deliberate deviation from the paper's
    representative-per-ball rule): the lower-key test runs against ALL
    same-cluster rows, not only surviving representatives, so on a
    similarity CHAIN a~b, b~c with a!~c BOTH b and c are marked
    duplicates even though c's only near-neighbor (b) is itself
    removed. This is the transitive/aggressive variant — one
    self-join, no iteration; it removes a superset of the paper's
    choice (stricter dedup, never a missed duplicate). Callers needing
    ball-exact survivors should feed the pair list through
    ``connected_components`` + ``dedup_survivors`` instead.

    Output: (pkey, cell, is_dup) for every input row.

    Scale shape: the pair generator is a per-cell equi-join — with k
    balanced clusters the candidate space is n^2/k instead of n^2, and
    the cluster count is the knob that keeps the join tractable at
    corpus scale (SemDeDup runs k in the tens of thousands); the
    centroid assignment is the same broadcast + keyed-window stage the
    IVF index uses (ann.assign_ivf_cells).

    AUTO-SIZING (``centroids_df=None``, the safe default): k is derived
    from the corpus as ``ceil(n / target_cell_size)`` and the centroids
    are kmeans-trained (the same trainer the persisted IVF index uses),
    keeping the expected per-cell pair count ~target_cell_size²/2
    CONSTANT as the corpus grows — a fixed k at 10x rows is ~100x pairs
    (measured 310 s vs 27 s at sf1.0, SCALING.md), a quadratic footgun
    no caller should be able to copy from a small-fixture config. Pass
    an explicit centroid table only to pin reproducible cells (the gate
    fixture) or reuse an already-trained quantizer.

    PAIR STAGE (``pair_mode``): the within-cell compare is cell-local by
    construction, so the default ``"gemm"`` runs it as ONE
    ``applyInPandas`` over cell groups — a float64 numpy GEMM prefilter
    (``threshold - 1e-6``) picks candidate pairs, then each candidate is
    re-scored with the exact left-to-right sequential fold the
    ``cosine_similarity`` expression and the DuckDB oracle both use, so
    the marked set is BIT-IDENTICAL to the join path (the GEMM's blocked
    summation differs from the sequential fold by ~dim·eps ≈ 1e-14;
    the 1e-6 margin makes the prefilter a strict superset and the exact
    rescore settles membership — property-tested in tests/test_dedup.py).
    One shuffle on ``cell``, no pair-row materialization: the previous
    join shape shuffled ~n²/k joined rows each carrying two full
    embedding arrays. ``"join"`` keeps the pure-DataFrame self-join
    (the parity baseline, and the fallback if a single cell could
    overflow one task's memory — at the default ``target_cell_size``
    a cell is ~256 rows, far below that).
    """
    from pg_vectorize_spark.operators.ann import assign_ivf_cells

    if pair_mode not in ("gemm", "join"):
        raise ValueError(f"unknown pair_mode {pair_mode!r}")

    if centroids_df is None:
        import math

        from pg_vectorize_spark.operators.ann import (
            train_ivf_centroids_kmeans,
        )

        n = emb_df.count()
        k = max(1, math.ceil(n / max(1, target_cell_size)))
        centroids_df = train_ivf_centroids_kmeans(
            emb_df, pkey, emb_col, n_centroids=k, seed=seed
        )

    if pair_mode == "gemm":
        assigned = assign_ivf_cells(emb_df, centroids_df, pkey, emb_col)
        return _cell_dedup_gemm(
            assigned, pkey, emb_col, float(threshold)
        )

    # the assignment (broadcast crossJoin + keyed window) feeds THREE
    # consumers (both pair sides + the output join): materialize once
    # instead of re-running the window per consumer
    assigned = assign_ivf_cells(
        emb_df, centroids_df, pkey, emb_col
    ).localCheckpoint()
    a = assigned.select(
        F.col("cell"),
        F.col(pkey).alias("_a"),
        F.col(emb_col).alias("_ea"),
    )
    b = assigned.select(
        F.col("cell"),
        F.col(pkey).alias("_b"),
        F.col(emb_col).alias("_eb"),
    )
    dup_keys = (
        a.join(b, "cell")
        .filter(F.col("_a") < F.col("_b"))
        .filter(
            cosine_similarity(F.col("_ea"), F.col("_eb"))
            >= F.lit(threshold)
        )
        .select(F.col("_b").alias(pkey))
        .distinct()
    )
    return assigned.select(F.col(pkey), F.col("cell")).join(
        dup_keys.withColumn("_d", F.lit(True)), pkey, "left"
    ).select(
        F.col(pkey),
        F.col("cell"),
        F.coalesce(F.col("_d"), F.lit(False)).alias("is_dup"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    pkey: str,
    sep: str = "\n",
    hash_keys: bool = True,
) -> DataFrame:
    """Corpus-wide paragraph-level deduplication (the CCNet/RedPajama
    preprocessing granularity, Wenzek et al. 2020): every paragraph
    that already appeared in an earlier position of the corpus —
    ordered by (document key, paragraph position) — is dropped, and
    each document is reassembled from its surviving paragraphs.

    Output: ONE row per input document — (pkey, n_paras, n_kept,
    clean_text); documents whose every paragraph was seen before (or
    that were NULL/empty/blank) come back with counts 0-or-more and
    clean_text = ''.

    ``sep`` is a LITERAL separator (regex metacharacters are quoted
    before the split and the rejoin uses the raw string, so the two
    stay consistent). ``hash_keys=True`` (default) shuffles the
    first-bearer window on xxhash64 of the paragraph instead of the
    full text — the only shape that matters at 100 TB (same contract
    as arrival_order_span_stats' hash_ngrams: an astronomically
    unlikely 64-bit collision merges two paragraphs); False keeps the
    exact-string key the oracle gate mirrors.

    Scale shape: one explode, one keyed window picking the first bearer
    per paragraph, one keyed reassembly aggregate, a broadcast-able
    join back to the document keys. Paragraph text rides the shuffle
    once; the sort-within-group concat is collect_list+array_sort —
    a single exchange on pkey.
    """
    # Per-character escaping, NOT \Q...\E: a separator containing the
    # literal sequence "\E" would terminate a quote block early and the
    # remainder would be parsed as regex, desynchronizing the split from
    # the literal rejoin below. Backslash-escaping every ASCII
    # non-alphanumeric covers all Java regex metacharacters; alphanumerics
    # (and non-ASCII) are left bare — escaping a letter is itself a Java
    # regex error.
    sep_re = "".join(
        c if (c.isalnum() or not c.isascii()) else "\\" + c for c in sep
    )
    paras = df.select(
        F.col(pkey),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                sep_re,  # literal, never a regex
            )
        ).alias("pos", "para"),
    ).filter(F.trim(F.col("para")) != F.lit(""))
    group_key = (
        F.xxhash64(F.col("para")) if hash_keys else F.col("para")
    )
    w = Window.partitionBy(group_key).orderBy(
        F.asc(pkey), F.asc("pos")
    )
    marked = paras.withColumn("_rn", F.row_number().over(w))
    kept = (
        marked.groupBy(pkey)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct(F.col("pos"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )
    # one row per INPUT document: blank/NULL/empty docs have no exploded
    # paragraphs, so they must be joined back in with zero counts — a
    # reassembly operator that shrinks corpus cardinality silently would
    # corrupt any keyed join-back
    return df.select(F.col(pkey)).join(kept, pkey, "left").select(
        F.col(pkey),
        F.coalesce(F.col("n_paras"), F.lit(0)).cast("long").alias("n_paras"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str,
    pkey: str,
    k: int = 20,
    hash_ngrams: bool = True,
) -> DataFrame:
    """Exact-substring span REMOVAL — the cleanup step
    ``duplicated_span_stats`` audits for (Lee et al. 2022 §4: keep one
    occurrence of each duplicated span, delete the rest). Rule: a k-word
    window appearing verbatim in >= 2 documents survives only in its
    FIRST bearer (min pkey — the same deterministic survivor rule as
    paragraph_dedup); every other bearer drops the window's word
    positions. A document with no cross-doc spans keeps its text
    byte-identical; a cleaned document is rebuilt from its surviving
    ORIGINAL whitespace tokens space-joined — casing and punctuation
    survive; only inter-token whitespace normalizes (flagged in
    ``was_rewritten``). Window MATCHING is case/punctuation-insensitive
    (each token normalizes to lowercase alphanumerics for the key), so
    'Hello, World' and 'hello world' count as the same span — the
    boilerplate semantics Lee et al. pipelines use.

    Output: (pkey, clean_text, n_words, n_removed_words, was_rewritten).

    Scale shape: posexplode to (doc, start-pos, window-key); one keyed
    aggregate per window key (min bearer + distinct-doc count); a semi
    shape back onto occurrences (equi-join on the window key — never
    doc x doc); removed start-positions collect per DOC (bounded by the
    doc's own window count); the rebuild is a per-row array expression
    (word x removed-interval containment test — O(words · spans) within
    one document, zero further shuffle). ``hash_ngrams`` as in the audit:
    8-byte keys for the 100-TB shuffle, exact strings for tests.
    """
    from pg_vectorize_spark.functions.text import word_ngrams_expr

    def _tokens(text):
        # ORIGINAL whitespace tokens — the same index space the rebuild
        # filters on, so window positions and surviving tokens align
        return F.filter(
            F.split(F.coalesce(text, F.lit("")), r"\s+"),
            lambda t: t != "",
        )

    def _norm(tokens):
        return F.transform(
            tokens,
            lambda t: F.regexp_replace(F.lower(t), "[^a-z0-9]", ""),
        )

    grams = word_ngrams_expr(_norm(_tokens(F.col(text_col))), k)
    win = df.select(
        F.col(pkey), F.posexplode(grams).alias("pos", "gram")
    )
    gkey = (
        F.xxhash64("gram") if hash_ngrams else F.col("gram")
    ).alias("gkey")
    win = win.select(F.col(pkey), F.col("pos"), gkey).localCheckpoint(
        eager=False
    )
    bearers = win.groupBy("gkey").agg(
        F.min(pkey).alias("_keeper"),
        F.count_distinct(F.col(pkey)).alias("_docs"),
    )
    removed = (
        win.join(
            bearers.filter(F.col("_docs") >= 2), "gkey"
        )
        .filter(F.col(pkey) != F.col("_keeper"))
        .groupBy(pkey)
        .agg(F.array_sort(F.collect_set("pos")).alias("_starts"))
    )
    words = _tokens(F.col(text_col))
    out = df.join(removed, pkey, "left")
    keep_words = F.filter(
        F.transform(words, lambda w, i: F.struct(w.alias("w"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_starts"),
            lambda st: (st <= s["i"]) & (s["i"] < st + F.lit(k)),
        ),
    )
    kept = F.transform(keep_words, lambda s: s["w"])
    n_words = F.size(words).cast("long")
    return out.select(
        F.col(pkey),
        F.when(F.col("_starts").isNull(), F.col(text_col))
        .otherwise(F.array_join(kept, " "))
        .alias("clean_text"),
        n_words.alias("n_words"),
        F.when(F.col("_starts").isNull(), F.lit(0).cast("long"))
        .otherwise(n_words - F.size(kept).cast("long"))
        .alias("n_removed_words"),
        F.col("_starts").isNotNull().alias("was_rewritten"),
    )
