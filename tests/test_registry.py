"""Driver-contract registry consistency — guards the wiring every gate
depends on: queries()/oracle_sql() key parity, callable entries, the
50-query correctness window shape, and bench coverage of the registry.
Cheap meta-checks that catch a mis-registered gate before the driver
does."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


class TestRegistryConsistency:
    def test_oracle_for_every_query(self):
        q = set(entry.queries())
        o = set(entry.oracle_sql())
        assert q == o, (
            f"queries without oracle: {sorted(q - o)}; "
            f"oracles without query: {sorted(o - q)}"
        )

    def test_entries_callable_and_unique(self):
        qs = entry.queries()
        assert all(callable(fn) for fn in qs.values())
        # two names bound to the same gate function is a registration
        # slip (copy-paste), except deliberate shared implementations
        from collections import Counter

        dupes = [
            fns
            for fns, n in Counter(
                id(fn) for fn in qs.values()
            ).items()
            if n > 1
        ]
        assert not dupes

    def test_window_holds_fifty(self):
        names = list(entry.queries())
        assert len(names) >= 50
        # the rotation policy's window is exactly the first 50 names;
        # each must be distinct (dict guarantees) and the registry big
        # enough that a 2-round rotation covers everything
        assert len(names) <= 150, (
            "registry grew past 3x the window — even the amended "
            "3-round rotation (VERDICT r10 #3: same-session "
            "check_oracle.py runs are interim evidence for names "
            "outside the driver window) can no longer keep every "
            "query's driver evidence <= 3 rounds old; revisit the "
            "policy comment in __spark_entry__ and COVERAGE.md"
        )

    # The EXACT intended first-50 window for the current round — update
    # this list whenever the rotation policy moves names (VERDICT r9
    # wrong #1: the window was comment-implied only, and an off-by-one
    # in the comment block silently dropped fts_search_topk out of the
    # r9 gate; a mis-rotation must fail here, in pytest, not at the
    # driver).
    R12_WINDOW = [
        # positions 1-2: NEW in r12 (curation->job->search seam gate +
        # the multilingual analyzer gate) — first driver rows
        "curate_job_search_e2e", "fts_multilang_stemmed",
        # positions 3-4: freshest driver row is r9 (yielded their
        # slots in r11) — oldest evidence leads
        "hybrid_rrf_indexed", "search_tokens",
        # positions 5-50: freshest driver row is r10 — the r11
        # rotated-out set returns minus the four deferred names
        # (sample_exact, c4_flags, multimodal_meta, vocabulary_topk —
        # wait for r13 on this session's check_oracle evidence)
        "fts_search_topk", "dedup_semantic_cluster", "hard_negatives",
        "fts_stemmed", "simhash_neardup_pairs", "dedup_embedding_cosine",
        "ann_ivf_topk", "ann_signbit_lsh_topk", "dup_span_stats",
        "gopher_flags", "corpus_mix", "unigram_logprob",
        "events_windowed_agg", "sessionize_events", "asof_join_events",
        "asof_join_bucketed", "attribution_window_join", "quality_score",
        "repetition_score", "pii_scrub", "mp4_frame_extract",
        "dsir_weights", "paragraph_dedup", "change_detection",
        "append_method_scan", "quantized_search_topk", "maxsim_search_topk",
        "pq_adc_search", "pq_rerank_search", "fts_bm25",
        "hybrid_bm25", "fts_cover_density", "semantic_search_indexed",
        "neardup_index_probe", "neardup_probe_local", "dedup_minhash_lsh",
        "minhash_signatures", "cdf_apply", "incremental_scan_events",
        "fts_search_overlay", "sequence_pack", "pack_manifest",
        "line_dedup", "bpe_token_count", "sample_weighted",
        "perplexity_buckets",
    ]

    def test_r12_window_names(self):
        names = list(entry.queries())[:50]
        assert len(self.R12_WINDOW) == 50, (
            f"intended window lists {len(self.R12_WINDOW)} names, not 50"
        )
        assert names == self.R12_WINDOW, (
            "first-50 registry window drifted from the intended "
            f"rotation; first divergence at position "
            f"{next(i for i, (a, b) in enumerate(zip(names, self.R12_WINDOW)) if a != b) + 1}"
        )

    def test_oracles_are_nonempty_sql(self):
        for name, sql in entry.oracle_sql().items():
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name

    def test_coverage_doc_count_matches_registry(self):
        # COVERAGE.md states the registry size in prose ("all NN"); r7
        # shipped 91 queries while the doc still said 90 (VERDICT r7
        # wrong #3). Pin prose to code so they can't drift again.
        import re

        text = open("/root/repo/COVERAGE.md").read()
        m = re.search(r"all (\d+) — matches DuckDB", text)
        assert m, "COVERAGE.md lost its registry-count sentence"
        assert int(m.group(1)) == len(entry.queries()), (
            f"COVERAGE.md says {m.group(1)} queries; registry has "
            f"{len(entry.queries())}"
        )

    def test_bench_covers_registry(self):
        # bench.py sweeps list(queries()) — pin that contract so a
        # future curated-subset edit is a conscious decision
        import inspect

        import bench

        src = inspect.getsource(bench.main)
        assert "bench_names = list(qs)" in src


class TestR13Handoff:
    def test_deferred_names_lead_the_tail(self):
        """The four r10-evidence names deferred from the r12 window
        (COVERAGE.md rotation record) must sit at positions 51-54 so
        the r13 rotation picks them FIRST — silently burying them in
        the tail would let their driver evidence exceed the 3-round
        policy."""
        names = list(entry.queries())
        assert names[50:54] == [
            "sample_exact",
            "c4_flags",
            "multimodal_meta",
            "vocabulary_topk",
        ]
