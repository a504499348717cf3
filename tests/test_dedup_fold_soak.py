"""Delete-heavy fold-cycle longevity soak (VERDICT r11 #3): the r11/r12
deferral invariants are proven for single fold cycles; deferred-delete
designs historically break under MANY fold+compact cycles with
sustained delete + re-insert churn (tombstone→fold→re-insert→tombstone
aliasing across generations). This soak drives >= 10 compaction
cadences of mixed insert / delete / re-insert batches through the
band-index manager with an aggressive slice cap (fold_bucket_cap=2, so
generations span MULTIPLE cadences and new tombstones arrive
mid-generation), asserting at EVERY cadence boundary that the probe
result — both the Spark and driver-local paths — exactly equals a
from-scratch twin built over the live corpus, and that the pending
tombstone count stays bounded. A final maintain()-style full fold must
return pending to zero with the store still probe-identical and the
sidecar holding exactly the live keys.

Bounded rows (~hundreds of docs) so it stays CI-runnable; marked
``soak`` for deselection (-m 'not soak').
"""

from __future__ import annotations

import os

import pytest

from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

PARAMS = {
    "num_hashes": 16,
    "bands": 4,
    "shingle_k": 3,
    "band_buckets": 16,
    "compact_every": 2,      # one cadence per soak cycle (2 ops/cycle)
    "fold_bucket_cap": 2,    # generations span many cadences
}
N_CYCLES = int(os.environ.get("SOAK_CYCLES", "10"))


def _text(k: int, gen: int = 0) -> str:
    """Deterministic doc text with shingle structure: docs sharing
    k % 5 are near-dups of each other; ``gen`` versions re-inserted
    text so a re-insert is a REAL content change."""
    return (
        f"document {k} generation {gen} discusses shared topic "
        f"{k % 5} with common boilerplate running text that repeats "
        f"across the corpus family {k % 5} again and again"
    )


def _probe_sets(mgr, query_rows):
    sig_rows = mgr.signatures_local(query_rows)
    local = {
        (a, b, round(j, 9))
        for a, b, j in mgr.probe_local(sig_rows, "doc_id", "bigint")
    }
    spark_df = mgr.probe(
        mgr.spark.createDataFrame(query_rows, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    spark_set = {
        (r["doc_id"], r["match_doc_id"], round(r["est_jaccard"], 9))
        for r in spark_df.collect()
    }
    return local, spark_set


@pytest.mark.soak
def test_fold_cycle_longevity(spark, tmp_path):
    live: dict[int, str] = {k: _text(k) for k in range(200)}
    deleted: dict[int, int] = {}  # key -> next re-insert generation
    next_key = 200

    mgr = MinHashBandIndexManager(spark, str(tmp_path / "soak"), PARAMS)
    mgr.build(
        spark.createDataFrame(
            sorted(live.items()), "doc_id long, text string"
        ),
        "doc_id",
        "text",
    )
    query_rows = [(10_000 + i, _text(i)) for i in range(5)]

    max_pending = 0
    for cycle in range(N_CYCLES):
        for step in range(2):  # two maintenance ops per cadence
            # 20 fresh inserts
            inserts = {k: _text(k) for k in range(next_key, next_key + 20)}
            next_key += 20
            # re-insert up to 5 previously-deleted keys with NEW text
            reins = {}
            for k in sorted(deleted)[:5]:
                gen = deleted.pop(k)
                reins[k] = _text(k, gen)
            # delete 10 live keys (oldest first — these alias with the
            # keys re-inserted in LATER cycles)
            dels = sorted(live)[:10]
            batch = {**inserts, **reins}
            sig_rows = mgr.signatures_local(sorted(batch.items()))
            mgr.upsert_local(
                sig_rows,
                "doc_id",
                "bigint",
                prior_keys=frozenset(reins),
                delete_keys=dels,
            )
            live.update(batch)
            for k in dels:
                deleted[k] = deleted.get(k, 0) + 1
                live.pop(k)
        # ---- cadence boundary (compact_every=2 hit inside the loop):
        # the store must be probe-identical to a from-scratch twin over
        # the live corpus, on BOTH probe paths
        st = mgr._load_tomb_state()
        assert st["gen_keys"] <= st["keys"]
        assert not (st["keys"] & set(live)), (
            f"cycle {cycle}: live keys still tombstoned"
        )
        max_pending = max(max_pending, len(st["keys"]))
        twin = MinHashBandIndexManager(
            spark, str(tmp_path / f"twin{cycle}"), PARAMS
        )
        twin.build(
            spark.createDataFrame(
                sorted(live.items()), "doc_id long, text string"
            ),
            "doc_id",
            "text",
        )
        got_local, got_spark = _probe_sets(mgr, query_rows)
        want_local, want_spark = _probe_sets(twin, query_rows)
        assert got_local == want_local, f"cycle {cycle}: local diverged"
        assert got_spark == want_spark, f"cycle {cycle}: spark diverged"
        twin.drop()

    # churn keeps arriving and fold_bucket_cap=2 is deliberately
    # UNDERSIZED (to force mid-generation arrivals — the aliasing this
    # soak exists to catch), so pending grows to ~2 generations of
    # arrivals; the hard invariant is that folds RUN and keys leave
    # (pending < total deletes issued — a fold that never removes keys
    # would pin max_pending at the full delete volume). Keep-up cap
    # sizing is the fold_slice_probe / SCALING.md story, not this test.
    total_deleted = 10 * 2 * N_CYCLES
    assert max_pending < total_deleted, (max_pending, total_deleted)

    # final full fold (the maintain() knob): pending returns to zero,
    # the store stays probe-identical, and the sidecar holds exactly
    # the live keys
    mgr.maybe_compact(force=True, full_fold=True)
    assert mgr._load_tombstones() == set()
    twin = MinHashBandIndexManager(
        spark, str(tmp_path / "twin_final"), PARAMS
    )
    twin.build(
        spark.createDataFrame(
            sorted(live.items()), "doc_id long, text string"
        ),
        "doc_id",
        "text",
    )
    got_local, got_spark = _probe_sets(mgr, query_rows)
    want_local, want_spark = _probe_sets(twin, query_rows)
    assert got_local == want_local and got_spark == want_spark
    # sidecar exactness: every live key present, every folded key gone
    side = mgr._sidecar_sigs_for_keys_local(
        sorted(set(live) | set(deleted)), "doc_id", "bigint"
    )
    assert set(side) == set(live)
