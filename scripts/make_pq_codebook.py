"""Train and commit the PQ codebook fixture (tests/fixtures/
pq_codebook.json): deterministic numpy Lloyd's k-means per subspace on
the sf0.01 embeddings (operators/pq.pq_train_numpy, seed 7). Committed
so the DuckDB oracle can embed the identical codeword literals; rerun
only if the testdata embeddings change."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from pg_vectorize_spark.operators.pq import pq_train_numpy  # noqa: E402


def main() -> None:
    rows = duckdb.sql(
        "SELECT embedding FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet') "
        "ORDER BY vec_id"
    ).fetchall()
    vectors = [r[0] for r in rows]
    codebook = pq_train_numpy(vectors, m=8, k=16, seed=7, iters=12)
    # the FIXED query vector (vec_id 0 at training sf) rides the fixture
    # so the gate query and the oracle fold identical literals at EVERY
    # sf_dir — the same fixed-query-constant philosophy as QUERY_TEXT
    fixture = {
        "codebook": codebook,
        "query_vec": [float(x) for x in vectors[0]],
    }
    with open("/root/repo/tests/fixtures/pq_codebook.json", "w") as f:
        json.dump(fixture, f)
    print(
        f"trained on {len(vectors)} vectors -> m={len(codebook)} "
        f"k={len(codebook[0])} dsub={len(codebook[0][0])} + query_vec"
    )


if __name__ == "__main__":
    main()
