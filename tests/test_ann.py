"""ANN operator tests: approximations must return exact scores over their
candidate sets and achieve sane recall vs brute force on clustered data."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_vectorize_spark.operators.ann import (
    assign_ivf_cells,
    brute_force_topk,
    default_centroids,
    ivf_topk,
    signbit_lsh_topk,
)
from pg_vectorize_spark.providers.local import LocalHashEmbedder

EMB = LocalHashEmbedder(dim=16)

# two lexical clusters -> two embedding clusters
CORPUS = [
    (i, f"database query engine optimizer plan number {i}") for i in range(10)
] + [
    (i, f"music guitar melody rhythm song track {i}") for i in range(10, 20)
]


def _emb_df(spark):
    rows = [(i, EMB.embed_one(t)) for i, t in CORPUS]
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_brute_force_exact_order(spark):
    df = _emb_df(spark)
    q = EMB.embed_one("database query engine optimizer")
    out = brute_force_topk(df, "id", "vec", q, k=5).collect()
    assert len(out) == 5
    scores = [r["similarity_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # all results from the database cluster
    assert all(r["id"] < 10 for r in out)


def test_ivf_recall_on_clusters(spark):
    df = _emb_df(spark)
    cents = default_centroids(df, "id", "vec", n_centroids=4)
    q = EMB.embed_one("music guitar melody rhythm")
    exact = {r["id"] for r in brute_force_topk(df, "id", "vec", q, k=3).collect()}
    approx = {
        r["id"]
        for r in ivf_topk(df, cents, "id", "vec", q, k=3, nprobe=2).collect()
    }
    # probing 2/4 cells on clearly clustered data should recover the top-3
    assert len(exact & approx) >= 2


def test_ivf_assignment_covers_all(spark):
    df = _emb_df(spark)
    cents = default_centroids(df, "id", "vec", n_centroids=4)
    assigned = assign_ivf_cells(df, cents, "id", "vec")
    assert assigned.count() == 20  # every vector lands in exactly one cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {0, 1, 2, 3}


def test_signbit_lsh_returns_subset_of_bucket(spark):
    df = _emb_df(spark)
    q = EMB.embed_one("database query engine optimizer")
    out = signbit_lsh_topk(df, "id", "vec", q, k=10, nbits=4).collect()
    # approximate: results are a subset of the corpus with exact scores
    exact = {
        r["id"]: r["similarity_score"]
        for r in brute_force_topk(df, "id", "vec", q, k=20).collect()
    }
    for r in out:
        assert abs(exact[r["id"]] - r["similarity_score"]) < 1e-12


class TestPersistedIvfIndex:
    """Write-time partitioned IVF index: probing must become partition
    pruning at the parquet scan, and results must equal the on-the-fly
    ivf_topk."""

    def test_indexed_matches_inline_and_prunes(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import (
            build_ivf_index,
            default_centroids,
            ivf_topk,
            ivf_topk_indexed,
        )
        from pg_vectorize_spark.plans.inspect import plan_report

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
            "vec_id", F.col("embedding").alias("embeddings")
        )
        cents = default_centroids(emb, "vec_id", "embeddings", n_centroids=8)
        idx = str(tmp_path / "ivf_index")
        build_ivf_index(emb, cents, "vec_id", "embeddings", idx)

        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).head()["embeddings"]
        ]
        inline = ivf_topk(emb, cents, "vec_id", "embeddings", qv, k=10, nprobe=2)
        indexed = ivf_topk_indexed(
            spark, idx, cents, "vec_id", "embeddings", qv, k=10, nprobe=2
        )
        a = [(r["vec_id"], r["similarity_score"]) for r in inline.collect()]
        b = [(r["vec_id"], r["similarity_score"]) for r in indexed.collect()]
        assert a == b

        import re

        rep = plan_report(indexed)
        # the cell IN-filter must prune partitions at the source, not scan
        # all cells and filter rows
        pfs = re.findall(r"PartitionFilters: \[(.*?)\]", rep.text)
        assert any("cell" in pf for pf in pfs), rep.text


class TestMetricVariants:
    """brute_force_topk metric companions of the reference's index dist
    types (core/src/types.rs:63-76): l2 and ip rank exactly as numpy."""

    def test_metrics_match_numpy(self, spark):
        import numpy as np

        from pg_vectorize_spark.operators.ann import brute_force_topk

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(50, 8))
        q = [float(x) for x in rng.normal(size=8)]
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        qa = np.array(q)
        expect = {
            "cosine": np.argsort(
                -(vecs @ qa) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(qa))
            )[:5],
            "ip": np.argsort(-(vecs @ qa))[:5],
            "l2": np.argsort(np.linalg.norm(vecs - qa, axis=1))[:5],
        }
        for metric, exp in expect.items():
            got = [
                r["vec_id"]
                for r in brute_force_topk(
                    emb, "vec_id", "embedding", q, k=5, metric=metric
                ).collect()
            ]
            assert got == list(exp), metric

    def test_unknown_metric_raises(self, spark):
        import pytest

        from pg_vectorize_spark.operators.ann import brute_force_topk

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="unknown metric"):
            brute_force_topk(emb, "vec_id", "embedding", [1.0, 0.0], metric="hamming")


class TestSignbitIndex:
    """Persisted bucket-partitioned sign-bit index: multi-probe IN filter
    must prune PARTITIONS at the source, and results must equal the
    inline (bucket-as-column) variant."""

    def test_indexed_matches_inline_and_prunes(self, spark, tmp_path):
        import re

        from pyspark.sql import functions as F

        from pg_vectorize_spark.operators.ann import (
            build_signbit_index,
            signbit_lsh_topk,
            signbit_lsh_topk_indexed,
        )
        from pg_vectorize_spark.plans.inspect import plan_report
        from tests.conftest import SF_SMOKE

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
            "vec_id", F.col("embedding").alias("embeddings")
        )
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).head()["embeddings"]
        ]
        idx = str(tmp_path / "sb_idx")
        build_signbit_index(emb, "vec_id", "embeddings", idx, nbits=8)
        for h in (0, 2):
            inline = signbit_lsh_topk(
                emb, "vec_id", "embeddings", qv, k=10, nbits=8,
                probe_hamming=h,
            )
            indexed = signbit_lsh_topk_indexed(
                spark, idx, "vec_id", "embeddings", qv, k=10, nbits=8,
                probe_hamming=h,
            )
            a = [(r["vec_id"], r["similarity_score"]) for r in inline.collect()]
            b = [(r["vec_id"], r["similarity_score"]) for r in indexed.collect()]
            assert a == b, f"probe_hamming={h}"
        rep = plan_report(indexed)
        pfs = re.findall(r"PartitionFilters: \[(.*?)\]", rep.text)
        assert any("bucket" in pf for pf in pfs), rep.text


class TestIvfIncrementalMaintenance:
    """ivf_index_add / ivf_index_delete: the ingest-time index paths —
    append lands in the frozen quantizer's cells, delete rewrites only
    affected cells, and search over the maintained index equals search
    over a from-scratch build of the same final corpus."""

    def _setup(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import (
            build_ivf_index,
            default_centroids,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", F.col("embedding").alias("embeddings"))
        cents = default_centroids(emb, "vec_id", "embeddings", n_centroids=8)
        old = emb.filter(F.col("vec_id") % 2 == 0)
        new = emb.filter(F.col("vec_id") % 2 == 1)
        idx = str(tmp_path / "ivf_incr")
        build_ivf_index(old, cents, "vec_id", "embeddings", idx)
        return emb, cents, old, new, idx

    def test_add_equals_full_rebuild(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import (
            build_ivf_index,
            ivf_index_add,
            ivf_topk_indexed,
        )

        emb, cents, old, new, idx = self._setup(spark, tmp_path)
        ivf_index_add(new, cents, "vec_id", "embeddings", idx)

        full_idx = str(tmp_path / "ivf_full")
        build_ivf_index(emb, cents, "vec_id", "embeddings", full_idx)
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).head()["embeddings"]
        ]
        a = [
            (r["vec_id"], r["similarity_score"])
            for r in ivf_topk_indexed(
                spark, idx, cents, "vec_id", "embeddings", qv, k=10, nprobe=2
            ).collect()
        ]
        b = [
            (r["vec_id"], r["similarity_score"])
            for r in ivf_topk_indexed(
                spark, full_idx, cents, "vec_id", "embeddings", qv, k=10,
                nprobe=2,
            ).collect()
        ]
        assert a == b
        # a maintained index must still include odd (added) ids in results
        assert any(v % 2 == 1 for v, _ in a)

    def test_delete_rewrites_only_affected_cells(self, spark, tmp_path):
        import os

        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import (
            ivf_index_add,
            ivf_index_delete,
            ivf_topk_indexed,
        )

        emb, cents, old, new, idx = self._setup(spark, tmp_path)
        ivf_index_add(new, cents, "vec_id", "embeddings", idx)

        # record per-cell file sets before the delete
        def cell_files():
            out = {}
            for d in os.listdir(idx):
                if d.startswith("cell="):
                    out[d] = sorted(os.listdir(os.path.join(idx, d)))
            return out

        before = cell_files()
        doomed = emb.filter(F.col("vec_id").isin([1, 2, 3])).select("vec_id")
        doomed_cells = {
            f"cell={r['cell']}"
            for r in spark.read.parquet(idx)
            .join(doomed, "vec_id", "left_semi")
            .select("cell")
            .distinct()
            .collect()
        }
        removed = ivf_index_delete(spark, idx, doomed, "vec_id")
        assert removed == 3
        after = cell_files()
        # untouched cells keep their exact files; only hit cells rewrote
        for cell, files in before.items():
            if cell not in doomed_cells and cell in after:
                assert after[cell] == files, f"{cell} rewritten needlessly"
        left = {r["vec_id"] for r in spark.read.parquet(idx).select("vec_id").collect()}
        assert left.isdisjoint({1, 2, 3})
        # search still works over the maintained index
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).head()["embeddings"]
        ]
        got = ivf_topk_indexed(
            spark, idx, cents, "vec_id", "embeddings", qv, k=5, nprobe=8
        ).collect()
        assert len(got) == 5
        assert all(r["vec_id"] not in (1, 2, 3) for r in got)

    def test_delete_missing_keys_noop(self, spark, tmp_path):
        from pg_vectorize_spark.operators.ann import ivf_index_delete

        emb, cents, old, new, idx = self._setup(spark, tmp_path)
        ghosts = spark.createDataFrame([(999999,)], "vec_id long")
        assert ivf_index_delete(spark, idx, ghosts, "vec_id") == 0

    def test_signbit_add_delete(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import (
            build_signbit_index,
            signbit_index_add,
            signbit_index_delete,
            signbit_lsh_topk_indexed,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", F.col("embedding").alias("embeddings"))
        idx = str(tmp_path / "sb_incr")
        build_signbit_index(
            emb.filter("vec_id % 2 = 0"), "vec_id", "embeddings", idx
        )
        signbit_index_add(
            emb.filter("vec_id % 2 = 1"), "vec_id", "embeddings", idx
        )
        total = spark.read.parquet(idx).count()
        assert total == emb.count()
        doomed = spark.createDataFrame([(0,), (7,)], "vec_id long")
        assert signbit_index_delete(spark, idx, doomed, "vec_id") == 2
        left = {
            r["vec_id"]
            for r in spark.read.parquet(idx).select("vec_id").collect()
        }
        assert 0 not in left and 7 not in left
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 2).head()["embeddings"]
        ]
        got = signbit_lsh_topk_indexed(
            spark, idx, "vec_id", "embeddings", qv, k=5, probe_hamming=8
        ).collect()
        assert len(got) == 5


class TestQuantizedTopk:
    def test_ranking_close_to_brute_force(self, spark):
        """int8 scalar quantization keeps top-k ranking near-exact:
        recall@10 vs float brute force pinned >= 0.9 on the corpus."""
        import pyspark.sql.functions as F

        from pg_vectorize_spark.functions.vector import quantize_table
        from pg_vectorize_spark.operators.ann import (
            brute_force_topk,
            quantized_topk,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        qt = quantize_table(emb, "embedding", keep_cols=["vec_id"]).drop(
            "_vd"
        ).localCheckpoint()
        hits = 0
        queries = [0, 5, 11]
        for qid in queries:
            qv = [
                float(x)
                for x in emb.filter(F.col("vec_id") == qid).head()[
                    "embedding"
                ]
            ]
            exact = {
                r["vec_id"]
                for r in brute_force_topk(
                    emb.withColumnRenamed("embedding", "embeddings"),
                    "vec_id", "embeddings", qv, 10,
                ).collect()
            }
            quant = {
                r["vec_id"]
                for r in quantized_topk(qt, "vec_id", qv, k=10).collect()
            }
            hits += len(exact & quant)
        assert hits / (10 * len(queries)) >= 0.9

    def test_scan_reads_codes_not_floats(self, spark, tmp_path):
        """Persisted quantized store: the search scan's ReadSchema is
        codes+mn+mx — the float embedding column never leaves disk."""
        import pyspark.sql.functions as F

        from pg_vectorize_spark.functions.vector import quantize_table
        from pg_vectorize_spark.operators.ann import quantized_topk
        from pg_vectorize_spark.plans.inspect import plan_report

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        store = str(tmp_path / "qstore")
        quantize_table(emb, "embedding", keep_cols=["vec_id"]).drop(
            "_vd"
        ).write.parquet(store)
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
        ]
        df = quantized_topk(spark.read.parquet(store), "vec_id", qv, k=10)
        rep = plan_report(df)
        assert rep.has_take_ordered, rep.summary()
        assert any(
            "codes" in s and "embedding" not in s for s in rep.read_schemas
        ), rep.read_schemas

    def test_compact_index(self, spark, tmp_path):
        """Repeated appends fragment partitions; compact_index rewrites
        only crowded ones, preserving content exactly."""
        import os

        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import (
            build_signbit_index,
            compact_index,
            signbit_index_add,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", F.col("embedding").alias("embeddings"))
        idx = str(tmp_path / "frag")
        build_signbit_index(
            emb.filter("vec_id % 6 = 0"), "vec_id", "embeddings", idx
        )
        for m in range(1, 6):
            signbit_index_add(
                emb.filter(f"vec_id % 6 = {m}"), "vec_id", "embeddings", idx
            )
        before_rows = {
            r["vec_id"]
            for r in spark.read.parquet(idx).select("vec_id").collect()
        }

        def max_files():
            worst = 0
            for d in os.listdir(idx):
                if d.startswith("bucket="):
                    n = sum(
                        1
                        for f in os.listdir(os.path.join(idx, d))
                        if not f.startswith((".", "_"))
                    )
                    worst = max(worst, n)
            return worst

        assert max_files() > 4  # fragmented by the appends
        n = compact_index(spark, idx, part_col="bucket", max_files=4)
        assert n > 0
        assert max_files() <= 4
        after_rows = {
            r["vec_id"]
            for r in spark.read.parquet(idx).select("vec_id").collect()
        }
        assert after_rows == before_rows  # content unchanged
        assert compact_index(spark, idx, part_col="bucket", max_files=4) == 0

    def test_mismatched_build_params_rejected(self, spark, tmp_path):
        """Review regression: incremental maintenance against an index
        built with different parameters must fail loudly, not silently
        bucket new vectors where probes never look."""
        import pyspark.sql.functions as F
        import pytest

        from pg_vectorize_spark.operators.ann import (
            build_ivf_index,
            build_signbit_index,
            default_centroids,
            ivf_index_add,
            signbit_index_add,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", F.col("embedding").alias("embeddings"))
        sb = str(tmp_path / "sb_meta")
        build_signbit_index(emb, "vec_id", "embeddings", sb, nbits=10)
        with pytest.raises(ValueError, match="nbits"):
            signbit_index_add(emb, "vec_id", "embeddings", sb)  # default 8

        ivf = str(tmp_path / "ivf_meta")
        c8 = default_centroids(emb, "vec_id", "embeddings", n_centroids=8)
        c4 = default_centroids(emb, "vec_id", "embeddings", n_centroids=4)
        build_ivf_index(emb, c8, "vec_id", "embeddings", ivf)
        with pytest.raises(ValueError, match="centroid_fp"):
            ivf_index_add(emb, c4, "vec_id", "embeddings", ivf)
        # matching params still work
        ivf_index_add(
            emb.filter("vec_id < 3"), c8, "vec_id", "embeddings", ivf
        )


class TestHardNegativeMining:
    def test_label_exclusion_and_ranking(self, spark):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.ann import hard_negative_mining

        def v(x):
            return [float(x), 1.0 - float(x)]

        rows = [
            (0, v(0.0), "a"),   # anchor
            (1, v(0.05), "a"),  # closest, SAME label -> excluded
            (2, v(0.1), "b"),   # closest different-label -> rank 1
            (3, v(0.2), "b"),   # rank 2
            (4, v(0.9), "c"),   # rank 3
        ]
        emb = spark.createDataFrame(rows, "id long, emb array<double>, lab string")
        anchors = emb.filter(F.col("id") == 0).select(
            F.col("id").alias("anchor_id"),
            F.col("emb").alias("anchor_vec"),
            F.col("lab").alias("anchor_label"),
        )
        out = hard_negative_mining(
            emb, anchors, "id", "emb", "lab", k=3
        ).orderBy("rank").collect()
        assert [(r["id"], r["rank"]) for r in out] == [(2, 1), (3, 2), (4, 3)]
        assert all(r["anchor_id"] == 0 for r in out)


class TestHardNegativeMiningIndexed:
    """IVF-probed hard-negative mining (the large-anchor-set variant):
    full-probe equality with the broadcast shape, partial-probe recall
    floor, and source-level partition pruning."""

    def _fixture(self, spark, tmp_path):
        import random

        from pg_vectorize_spark.index_manager import JobIndexManager

        rng = random.Random(11)
        rows = []
        for i in range(300):
            base = [0.0] * 8
            base[i % 4] = 1.0  # four coarse clusters
            v = [b + rng.uniform(-0.15, 0.15) for b in base]
            rows.append((i, v, i % 3))
        emb = spark.createDataFrame(
            rows, "vec_id long, embeddings array<double>, label int"
        )
        mgr = JobIndexManager(
            spark, str(tmp_path / "hn_idx"), "ivf",
            {"n_centroids": 8, "train": "kmeans"},
        )
        mgr.build(emb.select("vec_id", "embeddings"), "vec_id")
        anchors = emb.filter("vec_id < 6").select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embeddings").alias("anchor_vec"),
            F.col("label").alias("anchor_label"),
        )
        return emb, mgr, anchors

    def _mine(self, spark, emb, mgr, anchors, nprobe):
        from pg_vectorize_spark.operators.ann import (
            hard_negative_mining_indexed,
        )

        return hard_negative_mining_indexed(
            spark, mgr.index_dir, mgr.centroids_df(), anchors,
            "vec_id", "embeddings",
            labels_df=emb.select("vec_id", "label"), label_col="label",
            k=5, nprobe=nprobe,
        )

    def test_full_probe_equals_broadcast(self, spark, tmp_path):
        from pg_vectorize_spark.operators.ann import hard_negative_mining

        emb, mgr, anchors = self._fixture(spark, tmp_path)
        got = self._mine(spark, emb, mgr, anchors, nprobe=8).orderBy(
            "anchor_id", "rank"
        ).collect()
        ref = hard_negative_mining(
            emb.select("vec_id", "embeddings", "label"), anchors,
            "vec_id", "embeddings", label_col="label", k=5,
        ).orderBy("anchor_id", "rank").collect()
        assert [(r["anchor_id"], r["vec_id"], r["rank"]) for r in got] == [
            (r["anchor_id"], r["vec_id"], r["rank"]) for r in ref
        ]

    def test_partial_probe_recall_floor(self, spark, tmp_path):
        from pg_vectorize_spark.operators.ann import hard_negative_mining

        emb, mgr, anchors = self._fixture(spark, tmp_path)
        got = {
            (r["anchor_id"], r["vec_id"])
            for r in self._mine(
                spark, emb, mgr, anchors, nprobe=4
            ).collect()
        }
        ref = {
            (r["anchor_id"], r["vec_id"])
            for r in hard_negative_mining(
                emb.select("vec_id", "embeddings", "label"), anchors,
                "vec_id", "embeddings", label_col="label", k=5,
            ).collect()
        }
        recall = len(got & ref) / len(ref)
        assert recall >= 0.8, recall  # half the cells, >=80% of true negs
        # and every anchor still yields k results
        assert len(got) == len(ref)

    def test_scan_partition_pruned(self, spark, tmp_path):
        import re

        emb, mgr, anchors = self._fixture(spark, tmp_path)
        df = self._mine(spark, emb, mgr, anchors, nprobe=2)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan


class TestProbeCellsLocalParity:
    """probe_cells_local (the zero-Spark-job driver-side centroid rank)
    must be BIT-identical to the Spark-expression path: same scores
    (float bits), same cell selection, same tie order — the probe
    decides WHICH cells get scanned, so any divergence silently changes
    indexed-search results. Same parity bar as the FTS index's
    driver-side xxhash bucketing."""

    def _gen(self, rng, dim, n):
        cents = []
        for i in range(n):
            cents.append(
                (i, [rng.uniform(-10, 10) for _ in range(dim)])
            )
        # adversarial rows: zero vector (guard path), huge/tiny scale,
        # an exact duplicate of row 0 (tie -> id order)
        cents.append((n, [0.0] * dim))
        cents.append((n + 1, [x * 1e12 for x in cents[0][1]]))
        cents.append((n + 2, [x * 1e-12 for x in cents[0][1]]))
        cents.append((n + 3, list(cents[0][1])))
        return cents

    def test_scores_and_selection_bit_identical(self, spark):
        import random

        from pg_vectorize_spark.operators.ann import (
            probe_cells,
            probe_cells_local,
        )

        rng = random.Random(20260817)
        for dim in (3, 8, 32):
            cents = self._gen(rng, dim, 40)
            cdf = spark.createDataFrame(
                cents, "centroid_id int, centroid_vec array<double>"
            )
            queries = [
                [rng.uniform(-5, 5) for _ in range(dim)],
                [0.0] * dim,           # zero query -> all-guard ties
                cents[0][1],           # exact member vector
            ]
            for qv in queries:
                for nprobe in (1, 2, len(cents)):
                    via_spark = probe_cells(cdf, qv, nprobe)
                    local = probe_cells_local(cents, qv, nprobe)
                    assert [r["centroid_id"] for r in via_spark] == [
                        r["centroid_id"] for r in local
                    ], (dim, nprobe, qv[:3])
                    assert [
                        float(r["_qsim"]).hex() for r in via_spark
                    ] == [
                        float(r["_qsim"]).hex() for r in local
                    ], (dim, nprobe, qv[:3])

    def test_probe_cells_dispatches_local(self, spark):
        """A plain list input must not launch any Spark job — guard the
        type-dispatch so a refactor can't silently reintroduce the
        per-search job."""
        from pg_vectorize_spark.operators.ann import probe_cells

        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        out = probe_cells(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])], [1.0, 0.0], 1
        )
        after = tracker.getJobIdsForGroup(None)
        assert [r["centroid_id"] for r in out] == [0]
        assert before == after


class TestPrunedRowsLocal:
    """_pruned_rows (the probe-widening check) must read the probed
    partitions' row counts from the parquet footers DRIVER-SIDE — exact
    parity with the Spark metadata count it replaces (the count decides
    the probe width, which decides the scanned cell set, so any
    divergence changes indexed-search results) and zero Spark jobs on
    the steady-state search path."""

    def _ivf_mgr(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.index_manager import JobIndexManager

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", F.col("embedding").alias("embeddings"))
        mgr = JobIndexManager(
            spark,
            str(tmp_path / "ivf_index"),
            "ivf",
            {"n_centroids": 8, "nprobe": 2},
        )
        mgr.build(emb, "vec_id")
        return mgr, emb

    def _spark_count(self, spark, mgr, part_col, values):
        import pyspark.sql.functions as F

        return (
            spark.read.parquet(mgr.index_dir)
            .filter(F.col(part_col).isin(list(values)))
            .count()
        )

    def test_ivf_counts_match_spark_and_launch_no_jobs(
        self, spark, tmp_path
    ):
        from pg_vectorize_spark.operators.ann import probe_cells

        mgr, emb = self._ivf_mgr(spark, tmp_path)
        qv = [float(x) for x in emb.head()["embeddings"]]
        tracker = spark.sparkContext.statusTracker()
        for nprobe in (1, 2, 4, 8):
            cells = [
                int(r["centroid_id"])
                for r in probe_cells(mgr._centroids_local(), qv, nprobe)
            ]
            before = tracker.getJobIdsForGroup(None)
            local = mgr._pruned_rows(qv, nprobe=nprobe)
            after = tracker.getJobIdsForGroup(None)
            assert before == after, "widening check launched a Spark job"
            assert local == self._spark_count(spark, mgr, "cell", cells)
        # full width covers every indexed row
        assert mgr._pruned_rows(qv, nprobe=8) == emb.count()

    def test_absent_partition_counts_zero(self, spark, tmp_path):
        mgr, _ = self._ivf_mgr(spark, tmp_path)
        # a value with no partition dir contributes 0, same as the scan
        assert mgr._partition_rows_local("cell", [999]) == 0

    def test_unexpected_layout_falls_back_to_spark(
        self, spark, tmp_path, monkeypatch
    ):
        import os

        mgr, emb = self._ivf_mgr(spark, tmp_path)
        qv = [float(x) for x in emb.head()["embeddings"]]
        # the local reader REFUSES layouts it does not understand
        # (stray non-parquet entry in a probed partition) instead of
        # guessing a count
        cell_dirs = [
            d for d in os.listdir(mgr.index_dir) if d.startswith("cell=")
        ]
        stray = os.path.join(mgr.index_dir, cell_dirs[0], "notes.txt")
        with open(stray, "w") as f:
            f.write("not parquet")
        try:
            cells = [int(d.split("=")[1]) for d in cell_dirs]
            assert mgr._partition_rows_local("cell", cells) is None
        finally:
            os.remove(stray)
        # and when the local reader refuses, _pruned_rows returns the
        # Spark count unchanged (same number as the local path)
        expected = mgr._pruned_rows(qv, nprobe=8)
        monkeypatch.setattr(
            mgr, "_partition_rows_local", lambda *a, **k: None
        )
        assert mgr._pruned_rows(qv, nprobe=8) == expected == emb.count()

    def test_signbit_radius_counts_match(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.index_manager import JobIndexManager
        from pg_vectorize_spark.operators.ann import (
            _hamming_ball,
            query_signbit_bucket,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", F.col("embedding").alias("embeddings"))
        mgr = JobIndexManager(
            spark,
            str(tmp_path / "sb_index"),
            "signbit",
            {"nbits": 4, "probe_hamming": 1},
        )
        mgr.build(emb, "vec_id")
        qv = [float(x) for x in emb.head()["embeddings"]]
        tracker = spark.sparkContext.statusTracker()
        for radius in (0, 1, 2, 4):
            probes = _hamming_ball(
                query_signbit_bucket(qv, mgr.nbits), mgr.nbits, radius
            )
            before = tracker.getJobIdsForGroup(None)
            local = mgr._pruned_rows(qv, radius=radius)
            after = tracker.getJobIdsForGroup(None)
            assert before == after, "widening check launched a Spark job"
            assert local == self._spark_count(
                spark, mgr, "bucket", probes
            )
