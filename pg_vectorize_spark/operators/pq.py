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
    score = None
    for j, row in enumerate(tables):
        term = F.element_at(
            F.array(*[F.lit(float(v)) for v in row]),
            F.element_at(F.col(codes_col), j + 1) + F.lit(1),
        )
        score = term if score is None else score + term
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


def build_ivfpq_index(
    emb_df: DataFrame,
    centroids_df: DataFrame,
    codebook,
    pkey: str,
    emb_col: str,
    index_path: str,
) -> None:
    """IVF-PQ index build: coarse cell assignment (partition pruning at
    probe time) + PQ codes (32x-compressed payload) — the two pruning
    axes of the FAISS IVF-PQ architecture composed from this repo's
    parts. The stored index holds ONLY (pkey, pq_codes) per cell
    partition; the float vectors stay in the primary store and are
    touched solely by the final rerank.

    This is the non-residual variant (codes over raw vectors, one global
    codebook); classic IVF-PQ encodes the residual from the cell
    centroid for tighter quantization — a codebook-training upgrade that
    changes nothing structural here.
    """
    from pg_vectorize_spark.operators.ann import (
        _centroid_fingerprint,
        _write_index_meta,
        assign_ivf_cells,
    )

    assigned = assign_ivf_cells(emb_df, centroids_df, pkey, emb_col)
    coded = assigned.select(
        F.col(pkey),
        pq_encode_expr(F.col(emb_col), codebook).alias("pq_codes"),
        F.col("cell"),
    )
    coded.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    _write_index_meta(
        index_path,
        {
            "centroid_fp": _centroid_fingerprint(centroids_df),
            "pq_m": len(codebook),
            "pq_k": len(codebook[0]),
        },
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
) -> DataFrame:
    """IVF-PQ search: probe ``nprobe`` cells driver-side (the centroid
    table is tiny), scan ONLY those partitions' 8-byte codes (partition
    pruning x compression — nprobe/n_centroids of 1/32 of the data),
    ADC-rank to ``rerank_candidates``, exact-rerank their float vectors
    from the primary store.

    Scale shape: partition-pruned compressed scan + TakeOrdered, then a
    keyed semi-join reading ``rerank_candidates`` float rows. At 100 TB
    with 4096 cells and nprobe=4 the per-query scan is ~24 GB of codes
    instead of 100 TB of floats.
    """
    from pg_vectorize_spark.functions.vector import (
        cosine_similarity_to_query,
    )

    probed = (
        centroids_df.select(
            F.col("centroid_id"),
            cosine_similarity_to_query(
                F.col("centroid_vec"), query_vec
            ).alias("_qsim"),
        )
        .orderBy(F.desc("_qsim"), F.asc("centroid_id"))
        .limit(nprobe)
        .collect()
    )
    cells = [int(r["centroid_id"]) for r in probed]
    codes = spark.read.parquet(index_path).filter(
        F.col("cell").isin(cells)
    )
    cand = pq_adc_topk(
        codes, pkey, query_vec, codebook, k=rerank_candidates
    ).select(pkey)
    pruned = emb_df.join(cand, pkey, "left_semi")
    score = cosine_similarity_to_query(F.col(emb_col), query_vec)
    return (
        pruned.select(F.col(pkey), score.alias("similarity_score"))
        .orderBy(F.desc("similarity_score"), F.asc(pkey))
        .limit(k)
    )
