"""Product quantization (PQ) — 32x-compressed vectors with asymmetric
distance (ADC) scoring, entirely JVM-side.

The vector is split into ``m`` subvectors; each subvector is encoded as
the index of its nearest codeword in a per-subspace codebook (Jegou et
al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
the technique behind FAISS IVF-PQ). A 64-d float32 vector becomes m=8
one-byte codes: 256 bytes -> 8 bytes.

Query time uses ADC: the query's squared distance to every codeword is
precomputed DRIVER-side into per-subspace lookup tables (m x k floats,
pure Python arithmetic — no libm), folded into the plan as literals;
each row's approximate squared L2 distance is then a sum of m table
lookups on its codes — no vector math per row at all. Same literal-fold
pattern as the BM25 idf stats (operators/search.py), so the scoring
expression is reproducible bit-for-bit in DuckDB.

The codebook is a plain nested list (m x k x dsub floats) trained
offline (scripts/make_pq_codebook.py: deterministic numpy Lloyd's on the
fixture embeddings) and committed, so the oracle can embed the identical
literals. At production scale, train per-corpus with MLlib KMeans on a
sample and persist the codebook next to the encoded table.

Reference precedent: pg_vectorize's index choices are pgvector
HNSW/DiskANN (core/src/types.rs:63-103); PQ is the published
compressed-vector counterpart a 100-TB store needs when even int8
scalar codes (functions/vector.quantize_exprs) are too large to scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pq_train_numpy(
    vectors,
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    iters: int = 12,
):
    """Deterministic per-subspace Lloyd's k-means (numpy float64).

    Returns the codebook as nested Python lists (m x k x dsub) so it can
    be JSON-committed and embedded as plan literals. Empty clusters keep
    their previous centroid (standard fix, deterministic).
    """
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    codebook = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        codebook.append([[float(v) for v in row] for row in cents])
    return codebook


def _sub_slice(emb: Column, j: int, dsub: int) -> Column:
    """Subvector j as array<double> (cast-then-subtract order is the
    oracle contract)."""
    return F.transform(
        F.slice(emb, j * dsub + 1, dsub), lambda x: x.cast("double")
    )


def pq_encode_expr(emb: Column, codebook) -> Column:
    """array<int> PQ codes for a vector column; code_j = first argmin of
    the squared distances to subspace j's codewords (ties -> lowest
    index, matching DuckDB list_position on the min)."""
    m = len(codebook)
    dsub = len(codebook[0][0])
    codes = []
    for j in range(m):
        sub = _sub_slice(emb, j, dsub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(c)) for c in codeword]),
                        lambda x, c: (x - c) * (x - c),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                for codeword in codebook[j]
            ]
        )
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return F.array(*codes)


def pq_encode_table(
    df: DataFrame,
    pkey: str,
    emb_col: str,
    codebook,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """(pkey, keep_cols..., pq_codes) — the stored form: m small ints per
    vector instead of d floats."""
    return df.select(
        F.col(pkey),
        *[F.col(c) for c in keep_cols],
        pq_encode_expr(F.col(emb_col), codebook).alias("pq_codes"),
    )


def pq_distance_tables(query_vec: Sequence[float], codebook):
    """Driver-side ADC tables: tables[j][c] = squared L2 distance from
    the query's j-th subvector to codeword c. Pure Python float64
    arithmetic, left-to-right sums — bit-identical when re-evaluated by
    the oracle from the same literals."""
    m = len(codebook)
    dsub = len(codebook[0][0])
    q = [float(v) for v in query_vec]
    tables = []
    for j in range(m):
        sub = q[j * dsub : (j + 1) * dsub]
        row = []
        for codeword in codebook[j]:
            acc = 0.0
            for x, c in zip(sub, codeword):
                acc = acc + (x - c) * (x - c)
            row.append(acc)
        tables.append(row)
    return tables


def pq_adc_topk(
    codes_df: DataFrame,
    pkey: str,
    query_vec: Sequence[float],
    codebook,
    k: int = 10,
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Top-k by approximate squared L2 distance (ascending): score =
    t_0[code_0] + t_1[code_1] + ... (left-associated), each t_j a
    literal lookup table — per row the plan does m element_at calls and
    m-1 adds, nothing else.

    Scale shape: pure scan over the (tiny) code column + per-row lookup
    fold + TakeOrderedAndProject; no join, no shuffle, no Python.
    """
    tables = pq_distance_tables(query_vec, codebook)
    score = _adc_score_expr(tables, codes_col)
    return (
        codes_df.select(F.col(pkey), score.alias("adc_distance"))
        .orderBy(F.asc("adc_distance"), F.asc(pkey))
        .limit(k)
    )


def pq_encode_pandas(
    df: DataFrame,
    pkey: str,
    emb_col: str,
    codebook,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Arrow-batched PQ encode — the production WRITE-TIME path: one
    numpy argmin per batch instead of m*k interpreted expression folds
    per row (measured ~4x at 2k rows on local[8]; the gap widens with
    batch size since the numpy pass is O(1) dispatches per batch).
    Bit-identical codes to pq_encode_expr (same float64 math, same
    first-argmin tie rule — asserted in tests), which stays the
    oracle-parity form.
    """
    import numpy as np
    import pandas as pd

    m = len(codebook)
    dsub = len(codebook[0][0])
    book = [
        [[float(v) for v in cw] for cw in sub] for sub in codebook
    ]
    out_fields = ", ".join(
        [f"{pkey} {df.schema[pkey].dataType.simpleString()}"]
        + [
            f"{c} {df.schema[c].dataType.simpleString()}"
            for c in keep_cols
        ]
        + ["pq_codes array<int>"]
    )

    def encode(batches):
        np_book = np.asarray(book)  # (m, k, dsub)
        for pdf in batches:
            if not len(pdf):
                # empty Arrow batch: np.asarray of [] is shape (0,) and
                # the 2-D subvector slice below would raise IndexError
                out = {pkey: pdf[pkey]}
                for c in keep_cols:
                    out[c] = pdf[c]
                out["pq_codes"] = []
                yield pd.DataFrame(out)
                continue
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                sub = vecs[:, j * dsub : (j + 1) * dsub]
                # explicit LEFT-TO-RIGHT accumulation over the dsub
                # terms: numpy's .sum() uses pairwise summation, whose
                # different rounding can flip argmin when two codewords
                # are within an ulp — the expression path and the DuckDB
                # oracle both fold strictly left-to-right, and code
                # parity is the contract
                acc = np.zeros((len(vecs), np_book[j].shape[0]))
                for t in range(dsub):
                    diff = sub[:, t, None] - np_book[j][None, :, t]
                    acc = acc + diff * diff
                codes[:, j] = acc.argmin(axis=1)
            out = {pkey: pdf[pkey]}
            for c in keep_cols:
                out[c] = pdf[c]
            out["pq_codes"] = [list(map(int, row)) for row in codes]
            yield pd.DataFrame(out)

    cols = [pkey, *keep_cols, emb_col]
    return df.select(*cols).mapInPandas(encode, schema=out_fields)


def pq_adc_rerank_topk(
    codes_df: DataFrame,
    emb_df: DataFrame,
    pkey: str,
    emb_col: str,
    query_vec: Sequence[float],
    codebook,
    k: int = 10,
    rerank_candidates: int = 100,
    codes_col: str = "pq_codes",
) -> DataFrame:
    """The production PQ deployment shape: ADC over the compressed codes
    prunes to ``rerank_candidates`` ids, then ONLY those rows' float
    vectors are read for an exact cosine rerank — the FAISS
    refine/rerank pattern. Measured on the clustered 2k x 64d corpus:
    top-100 + rerank = 0.96 recall@10 while reading 5% of the float
    data (SCALING.md table); raw ADC ranking alone is 0.47 at this
    compression (m=8, k=16 = 32x).

    Scale shape: compressed-scan + TakeOrdered for candidates, a keyed
    semi-join into the float table (partition-prunable when the float
    store is bucketed on the key), exact rescore of ``rerank_candidates``
    rows.
    """
    from pg_vectorize_spark.functions.vector import (
        cosine_similarity_to_query,
    )

    cand = pq_adc_topk(
        codes_df, pkey, query_vec, codebook,
        k=rerank_candidates, codes_col=codes_col,
    ).select(pkey)
    pruned = emb_df.join(cand, pkey, "left_semi")
    score = cosine_similarity_to_query(F.col(emb_col), query_vec)
    return (
        pruned.select(F.col(pkey), score.alias("similarity_score"))
        .orderBy(F.desc("similarity_score"), F.asc(pkey))
        .limit(k)
    )


def _with_residual(
    assigned: DataFrame,
    centroids_df: DataFrame,
    emb_col: str,
    out_col: str = "_residual",
) -> DataFrame:
    """Attach the residual-from-assigned-centroid column (classic IVF-PQ
    encoding, Jegou et al. §III): residual = vec - centroid[cell]. The
    centroid table broadcasts (tiny); everything stays JVM-side."""
    cents = centroids_df.select(
        F.col("centroid_id").alias("cell"), F.col("centroid_vec")
    )
    return (
        assigned.join(F.broadcast(cents), "cell")
        .withColumn(
            out_col,
            F.zip_with(
                F.col(emb_col).cast("array<double>"),
                F.col("centroid_vec"),
                lambda a, b: a - b,
            ),
        )
        .drop("centroid_vec")
    )


def build_ivfpq_index(
    emb_df: DataFrame,
    centroids_df: DataFrame,
    codebook,
    pkey: str,
    emb_col: str,
    index_path: str,
    residual: bool = False,
    assigned_df: DataFrame | None = None,
) -> None:
    """IVF-PQ index build: coarse cell assignment (partition pruning at
    probe time) + PQ codes (32x-compressed payload) — the two pruning
    axes of the FAISS IVF-PQ architecture composed from this repo's
    parts. The stored index holds ONLY (pkey, pq_codes) per cell
    partition; the float vectors stay in the primary store and are
    touched solely by the final rerank.

    ``residual=True`` is classic IVF-PQ (Jegou et al. §III): each vector
    is encoded as the PQ code of its RESIDUAL from the assigned cell
    centroid — residuals concentrate near zero, so the same (m, k)
    codebook quantizes them tighter than raw vectors (recall uplift
    measured in SCALING.md). The codebook must then be TRAINED on
    residuals (train_pq_residual_sample feeds pq_train_numpy).

    ``assigned_df`` (pkey, emb_col, cell) skips the assignment pass —
    callers that already assigned cells (e.g. to train the residual
    codebook) pass it so the full-corpus crossJoin+window runs ONCE.
    """
    from pg_vectorize_spark.operators.ann import (
        _centroid_fingerprint,
        _write_index_meta,
        assign_ivf_cells,
    )

    assigned = (
        assigned_df
        if assigned_df is not None
        else assign_ivf_cells(emb_df, centroids_df, pkey, emb_col)
    )
    enc_col = emb_col
    if residual:
        assigned = _with_residual(assigned, centroids_df, emb_col)
        enc_col = "_residual"
    coded = assigned.select(
        F.col(pkey),
        pq_encode_expr(F.col(enc_col), codebook).alias("pq_codes"),
        F.col("cell"),
    )
    coded.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    _write_index_meta(
        index_path,
        {
            "centroid_fp": _centroid_fingerprint(centroids_df),
            "pq_m": len(codebook),
            "pq_k": len(codebook[0]),
            "residual": residual,
        },
    )


def ivfpq_index_add(
    emb_df: DataFrame,
    centroids_df: DataFrame,
    codebook,
    pkey: str,
    emb_col: str,
    index_path: str,
    residual: bool = False,
) -> None:
    """Incremental IVF-PQ maintenance: assign NEW vectors to the frozen
    coarse quantizer, PQ-encode with the frozen codebook (Arrow batch
    path — the production write shape), append only the touched cell
    partitions. The meta check refuses a mismatched quantizer, codebook
    shape, or residual mode — any of those would bucket/encode new
    vectors inconsistently with the existing index (VERDICT r5 #3)."""
    from pg_vectorize_spark.operators.ann import (
        _centroid_fingerprint,
        _check_index_meta,
        assign_ivf_cells,
    )

    _check_index_meta(
        index_path,
        {
            "centroid_fp": _centroid_fingerprint(centroids_df),
            "pq_m": len(codebook),
            "pq_k": len(codebook[0]),
            "residual": residual,
        },
    )
    assigned = assign_ivf_cells(emb_df, centroids_df, pkey, emb_col)
    enc_col = emb_col
    if residual:
        assigned = _with_residual(assigned, centroids_df, emb_col)
        enc_col = "_residual"
    coded = pq_encode_pandas(
        assigned, pkey, enc_col, codebook, keep_cols=["cell"]
    ).select(F.col(pkey), F.col("pq_codes"), F.col("cell"))
    coded.write.mode("append").partitionBy("cell").parquet(index_path)


def ivfpq_index_delete(
    spark,
    index_path: str,
    keys_df: DataFrame,
    pkey: str,
) -> int:
    """Incremental IVF-PQ delete — partition-local rewrite of only the
    cells holding the keys (see ann._partitioned_index_delete)."""
    from pg_vectorize_spark.operators.ann import _partitioned_index_delete

    return _partitioned_index_delete(
        spark, index_path, keys_df, pkey, "cell"
    )


def train_pq_residual_sample(
    emb_df: DataFrame,
    centroids_df: DataFrame,
    pkey: str,
    emb_col: str,
    sample_n: int = 2048,
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    assigned_df: DataFrame | None = None,
):
    """Train a residual codebook: assign a deterministic sample (lowest
    pkeys) to cells, subtract the assigned centroid, run the same
    per-subspace Lloyd's as the raw-vector path. Returns the codebook
    nested-list. Driver-side numpy over <= sample_n rows — the same
    sample-then-train shape MLlib KMeans uses for the coarse step.
    ``assigned_df`` reuses a precomputed cell assignment (see
    build_ivfpq_index)."""
    from pg_vectorize_spark.operators.ann import assign_ivf_cells

    assigned = (
        assigned_df
        if assigned_df is not None
        else assign_ivf_cells(emb_df, centroids_df, pkey, emb_col)
    )
    sample = (
        _with_residual(assigned, centroids_df, emb_col)
        .select(F.col(pkey), F.col("_residual"))
        .orderBy(F.asc(pkey))
        .limit(sample_n)
        .collect()
    )
    residuals = [[float(x) for x in r["_residual"]] for r in sample]
    return pq_train_numpy(residuals, m=m, k=k, seed=seed)


def _adc_score_expr(tables, codes_col: str = "pq_codes") -> Column:
    """Per-row ADC distance: t_0[code_0] + t_1[code_1] + ... over literal
    lookup tables (left-associated). The SINGLE definition of the ADC
    scoring fold — pq_adc_topk and ivfpq_candidates both build their
    score from it, so oracle bit-parity cannot silently diverge between
    the flat and IVF paths."""
    score = None
    for j, row in enumerate(tables):
        term = F.element_at(
            F.array(*[F.lit(float(v)) for v in row]),
            F.element_at(F.col(codes_col), j + 1) + F.lit(1),
        )
        score = term if score is None else score + term
    return score


def ivfpq_candidates(
    spark,
    index_path: str,
    centroids_df: "DataFrame | Sequence[tuple]",
    codebook,
    pkey: str,
    query_vec: Sequence[float],
    nprobe: int = 2,
    n_candidates: int = 100,
    residual: bool = False,
) -> DataFrame:
    """The compressed probe stage of IVF-PQ search: probe ``nprobe``
    cells driver-side, scan ONLY those partitions' codes (partition
    pruning x 32x compression), ADC-rank to ``n_candidates`` keys.
    Returns (pkey, adc_distance) — callers rerank the keys' float
    vectors from the primary store.

    ``residual=True`` scores against per-cell lookup tables built from
    (query - cell_centroid) — still one partition-pruned scan; the
    per-row expression dispatches on the (literal-folded) cell id, so
    the plan stays m element_at lookups + a CASE over nprobe branches.
    """
    from pg_vectorize_spark.operators.ann import probe_cells

    probed = probe_cells(centroids_df, query_vec, nprobe)
    cells = [int(r["centroid_id"]) for r in probed]
    codes = spark.read.parquet(index_path).filter(
        F.col("cell").isin(cells)
    )
    if not residual:
        score = _adc_score_expr(pq_distance_tables(query_vec, codebook))
    else:
        q = [float(v) for v in query_vec]
        score = None
        for r in probed:
            qres = [
                a - float(b) for a, b in zip(q, r["centroid_vec"])
            ]
            branch = _adc_score_expr(
                pq_distance_tables(qres, codebook)
            )
            cond = F.col("cell") == F.lit(int(r["centroid_id"]))
            score = (
                F.when(cond, branch)
                if score is None
                else score.when(cond, branch)
            )
    return (
        codes.select(F.col(pkey), score.alias("adc_distance"))
        .orderBy(F.asc("adc_distance"), F.asc(pkey))
        .limit(n_candidates)
    )


def ivfpq_topk(
    spark,
    index_path: str,
    centroids_df: DataFrame,
    emb_df: DataFrame,
    codebook,
    pkey: str,
    emb_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    rerank_candidates: int = 100,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ search: compressed partition-pruned ADC probe
    (``ivfpq_candidates``) then exact cosine rerank of the candidates'
    float vectors from the primary store.

    Scale shape: partition-pruned compressed scan + TakeOrdered, then a
    keyed semi-join reading ``rerank_candidates`` float rows. At 100 TB
    with 4096 cells and nprobe=4 the per-query scan is ~24 GB of codes
    instead of 100 TB of floats.
    """
    from pg_vectorize_spark.functions.vector import (
        cosine_similarity_to_query,
    )

    cand = ivfpq_candidates(
        spark,
        index_path,
        centroids_df,
        codebook,
        pkey,
        query_vec,
        nprobe=nprobe,
        n_candidates=rerank_candidates,
        residual=residual,
    ).select(pkey)
    pruned = emb_df.join(cand, pkey, "left_semi")
    score = cosine_similarity_to_query(F.col(emb_col), query_vec)
    return (
        pruned.select(F.col(pkey), score.alias("similarity_score"))
        .orderBy(F.desc("similarity_score"), F.asc(pkey))
        .limit(k)
    )
