"""Product quantization (operators/pq.py): encode determinism, ADC
scoring parity with a numpy reference, recall floors on the adversarial
uniform corpus, and the pure-scan plan shape."""

from __future__ import annotations

import json

import pytest

CODEBOOK = "/root/repo/tests/fixtures/pq_codebook.json"


@pytest.fixture(scope="module")
def fixture():
    with open(CODEBOOK) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def cb(fixture):
    return fixture["codebook"]


def test_codebook_shape(cb):
    assert len(cb) == 8
    assert all(len(sub) == 16 for sub in cb)
    assert all(len(cw) == 8 for sub in cb for cw in sub)


def test_encode_matches_numpy_reference(spark, cb):
    """Spark expression encode == straightforward numpy argmin."""
    import numpy as np
    import pyspark.sql.functions as F

    from pg_vectorize_spark.operators.pq import pq_encode_table

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).filter(F.col("vec_id") < 50)
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode_table(emb, "vec_id", "embedding", cb).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    book = np.array(cb)  # (m, k, dsub)
    for r in rows:
        v = np.array([float(x) for x in r["embedding"]])
        expect = []
        for j in range(8):
            sub = v[j * 8 : (j + 1) * 8]
            d2 = ((book[j] - sub[None, :]) ** 2).sum(axis=1)
            expect.append(int(d2.argmin()))
        assert got[r["vec_id"]] == expect, r["vec_id"]


def test_adc_scores_match_numpy(spark, cb):
    import numpy as np
    import pyspark.sql.functions as F

    from pg_vectorize_spark.operators.pq import (
        pq_adc_topk,
        pq_distance_tables,
        pq_encode_table,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    codes = pq_encode_table(emb, "vec_id", "embedding", cb)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    got = pq_adc_topk(codes, "vec_id", qv, cb, k=5).collect()
    tables = np.array(pq_distance_tables(qv, cb))
    code_map = {
        r["vec_id"]: list(r["pq_codes"]) for r in codes.collect()
    }
    for r in got:
        expect = sum(
            tables[j][code_map[r["vec_id"]][j]] for j in range(8)
        )
        assert abs(r["adc_distance"] - expect) < 1e-12


def test_recall_floor_adversarial_corpus(spark, cb):
    """Uniform-random vectors are PQ's worst case (no subspace
    structure): recall@10 floor pinned at the measured level, and the
    query's own vector must always rank first (self-consistency)."""
    import pyspark.sql.functions as F

    from pg_vectorize_spark.operators.ann import brute_force_topk
    from pg_vectorize_spark.operators.pq import (
        pq_adc_topk,
        pq_encode_table,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    codes = pq_encode_table(
        emb, "vec_id", "embedding", cb
    ).localCheckpoint()
    bf = emb.select("vec_id", F.col("embedding").alias("embeddings"))
    hits = 0
    for qid in [0, 5, 11, 23, 42]:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]
        ]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(
                bf, "vec_id", "embeddings", qv, 10
            ).collect()
        }
        approx = [
            r["vec_id"]
            for r in pq_adc_topk(codes, "vec_id", qv, cb, k=10).collect()
        ]
        hits += len(exact & set(approx))
        assert approx[0] == qid  # self always first
    assert hits / 50 >= 0.25


def test_adc_plan_pure_scan_take_ordered(spark, cb, tmp_path):
    """Over a PERSISTED code table the ADC scan reads only (vec_id,
    pq_codes) — 8 bytes of codes instead of 256 of floats — and plans as
    scan + lookup fold + TakeOrdered: no join, no shuffle, no Python."""
    import pyspark.sql.functions as F

    from pg_vectorize_spark.operators.pq import (
        pq_adc_topk,
        pq_encode_table,
    )
    from pg_vectorize_spark.plans.inspect import plan_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = str(tmp_path / "pq_store")
    pq_encode_table(emb, "vec_id", "embedding", cb).write.parquet(store)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    df = pq_adc_topk(spark.read.parquet(store), "vec_id", qv, cb, k=10)
    rep = plan_report(df)
    assert rep.has_take_ordered, rep.summary()
    assert rep.n_exchanges == 0, rep.summary()
    assert any(
        "pq_codes" in s and "embedding" not in s for s in rep.read_schemas
    ), rep.read_schemas
    assert "ArrowEvalPython" not in rep.text
    assert "BatchEvalPython" not in rep.text


def test_arrow_encode_bit_identical_to_expression(spark, cb):
    """pq_encode_pandas (production write path) must emit exactly the
    codes pq_encode_expr (oracle-parity path) emits."""
    from pg_vectorize_spark.operators.pq import (
        pq_encode_pandas,
        pq_encode_table,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode_table(emb, "vec_id", "embedding", cb).collect()
    }
    b = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode_pandas(
            emb, "vec_id", "embedding", cb
        ).collect()
    }
    assert a == b


def test_adc_rerank_recall_floor(spark, cb):
    """The production shape (ADC prune -> exact rerank) recovers most of
    the recall raw ADC ranking loses: floor pinned on the clustered
    corpus at the measured level (0.96 @ top-100 on 2k x 64d)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.ann_recall import clustered_vectors

    import pyspark.sql.functions as F

    from pg_vectorize_spark.operators.ann import brute_force_topk
    from pg_vectorize_spark.operators.pq import (
        pq_adc_rerank_topk,
        pq_encode_pandas,
        pq_train_numpy,
    )

    rows = clustered_vectors()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    book = pq_train_numpy([r[1] for r in rows], m=8, k=16, seed=7, iters=12)
    codes = pq_encode_pandas(
        emb, "vec_id", "embedding", book
    ).localCheckpoint()
    hits = 0
    qids = [0, 266, 532, 798, 1064]
    for qid in qids:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]
        ]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(
                emb, "vec_id", "embedding", qv, 10
            ).collect()
        }
        got = {
            r["vec_id"]
            for r in pq_adc_rerank_topk(
                codes, emb, "vec_id", "embedding", qv, book,
                k=10, rerank_candidates=100,
            ).collect()
        }
        hits += len(exact & got)
    assert hits / 50 >= 0.85


def test_ivfpq_end_to_end(spark, tmp_path):
    """IVF-PQ composite: partition-pruned compressed probe + ADC + exact
    rerank — recall floor on the clustered corpus, plus the plan-level
    pruning check (the probed-cell filter reaches the parquet source as
    a partition filter; the scan reads codes, never floats)."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import pyspark.sql.functions as F
    from scripts.ann_recall import clustered_vectors

    from pg_vectorize_spark.operators.ann import (
        brute_force_topk,
        train_ivf_centroids_kmeans,
    )
    from pg_vectorize_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
        pq_train_numpy,
    )

    rows = clustered_vectors()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    cents = train_ivf_centroids_kmeans(
        emb, "vec_id", "embedding", n_centroids=16, seed=11
    ).localCheckpoint()
    book = pq_train_numpy([r[1] for r in rows], m=8, k=16, seed=7, iters=12)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, cents, book, "vec_id", "embedding", idx)

    hits = 0
    qids = [0, 266, 532, 798, 1064]
    for qid in qids:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]
        ]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(
                emb, "vec_id", "embedding", qv, 10
            ).collect()
        }
        got = ivfpq_topk(
            spark, idx, cents, emb, book, "vec_id", "embedding", qv,
            k=10, nprobe=4, rerank_candidates=100,
        )
        hits += len(exact & {r["vec_id"] for r in got.collect()})
    assert hits / 50 >= 0.7  # nprobe=4/16 cells AND 32x codes AND rerank

    # plan: the code scan is partition-filtered on the probed cells and
    # reads pq_codes, never the float embedding column
    qv = [float(x) for x in rows[0][1]]
    df = ivfpq_topk(
        spark, idx, cents, emb, book, "vec_id", "embedding", qv,
        k=10, nprobe=2,
    )
    from pg_vectorize_spark.plans.inspect import plan_report

    rep = plan_report(df)
    assert re.search(r"PartitionFilters: \[[^\]]*cell", rep.text), rep.text
    assert any(
        "pq_codes" in s and "embedding" not in s for s in rep.read_schemas
    ), rep.read_schemas


@pytest.mark.slow
def test_residual_recall_uplift(spark, tmp_path):
    """Residual IVF-PQ (VERDICT r5 #6): codebook trained on residuals
    from the assigned cell centroid quantizes tighter at the same m,k —
    floors pinned at the measured levels (SCALING.md residual table:
    ADC-only 0.553 vs 0.473 raw; rerank@50 0.973 vs 0.933)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import pyspark.sql.functions as F
    from scripts.ann_recall import clustered_vectors

    from pg_vectorize_spark.operators.ann import (
        brute_force_topk,
        train_ivf_centroids_kmeans,
    )
    from pg_vectorize_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_candidates,
        ivfpq_topk,
        train_pq_residual_sample,
    )

    rows = clustered_vectors()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    cents = train_ivf_centroids_kmeans(
        emb, "vec_id", "embedding", n_centroids=16
    ).localCheckpoint()
    book = train_pq_residual_sample(
        emb, cents, "vec_id", "embedding", sample_n=2048, m=8, k=16
    )
    idx = str(tmp_path / "res_idx")
    build_ivfpq_index(
        emb, cents, book, "vec_id", "embedding", idx, residual=True
    )
    qids = list(range(0, 2000, 133))[:15]
    adc_hits = rerank_hits = 0
    for qid in qids:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]
        ]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(
                emb, "vec_id", "embedding", qv, 10
            ).collect()
        }
        adc = {
            r["vec_id"]
            for r in ivfpq_candidates(
                spark, idx, cents, book, "vec_id", qv,
                nprobe=4, n_candidates=10, residual=True,
            ).collect()
        }
        rer = {
            r["vec_id"]
            for r in ivfpq_topk(
                spark, idx, cents, emb, book, "vec_id", "embedding", qv,
                k=10, nprobe=4, rerank_candidates=50, residual=True,
            ).collect()
        }
        adc_hits += len(exact & adc)
        rerank_hits += len(exact & rer)
    n = 10 * len(qids)
    # raw-codebook ADC measured 0.473 on this protocol: the residual
    # floor sits ABOVE it, so the uplift itself is what's pinned
    assert adc_hits / n >= 0.50, adc_hits / n
    assert rerank_hits / n >= 0.92, rerank_hits / n
