"""Drift recall probe: does the retrain recommendation actually matter?

Corpus drift scenario: the quantizer trains on region-A vectors (sf0.1
embeddings as-is); the corpus then grows 2x with region-B vectors (the
same embeddings negated + rotated - a distribution the trained
centroids never saw). Measure recall@10 for region-B queries (probe
candidates vs brute-force truth) with the STALE quantizer, then after
build() retrains. nprobe fixed, no auto-widening (min_rows=None) so
the quantizer quality is the only variable.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
  .config("spark.sql.shuffle.partitions","32")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
out = open("/tmp/drift_recall.txt","w",buffering=1)

from pg_vectorize_spark.index_manager import JobIndexManager
import numpy as np

emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
    F.col("vec_id").alias("id"), F.col("embedding").alias("embeddings"))
emb = emb.localCheckpoint()
rows = emb.collect()
dim = len(rows[0]["embeddings"])
A = [(int(r["id"]), [float(x) for x in r["embeddings"]]) for r in rows]
# region B: negate + roll the components -> different cluster structure, unit-norm preserved
B = [(100000+i, [float(x) for x in np.roll(-np.array(v), dim//3)]) for i,(i2,v) in enumerate(A)]
dfA = spark.createDataFrame(A, "id long, embeddings array<double>")
dfB = spark.createDataFrame(B, "id long, embeddings array<double>")

idx_dir = "/tmp/drift_recall_idx"
import shutil; shutil.rmtree(idx_dir, ignore_errors=True)
PROBES = (2, 4)

both = dfA.unionByName(dfB).localCheckpoint()
mat = np.array([v for _, v in A+B]); ids = np.array([i for i,_ in A+B])

queries = [v for _, v in B[7:407:40]]  # 10 region-B queries

def recall(mgr):
    hits = 0
    for q in queries:
        qv = np.array(q)
        truth = set(ids[np.argsort(-(mat @ qv))[:10]].tolist())
        cand = mgr.candidates(q)  # no min_rows: fixed nprobe
        got = [(r["id"], np.dot(np.array(r["embeddings"]), qv)) for r in cand.collect()]
        got = {i for i,_ in sorted(got, key=lambda t: -t[1])[:10]}
        hits += len(truth & got)
    return hits / (10*len(queries))

for nprobe in PROBES:
    d = f"{idx_dir}_{nprobe}"
    import shutil as _sh; _sh.rmtree(d, ignore_errors=True)
    mgr = JobIndexManager(spark, d, "ivf",
        {"n_centroids": 16, "nprobe": nprobe, "train": "kmeans", "compact_every": 10**9})
    mgr.build(dfA, "id")
    mgr.add(dfB, "id")
    r_stale = recall(mgr)
    s = mgr.drift_stats()
    mgr.build(both, "id")
    r_fresh = recall(mgr)
    print(f"nprobe={nprobe}/16: stale recall@10 = {r_stale:.3f} -> retrained {r_fresh:.3f} (growth={s['growth']:.2f} skew={s['skew']:.2f})", file=out)
out.close(); spark.stop()
