"""Iterative connected-components dedup vs a pure-Python BFS oracle."""

from __future__ import annotations

import pytest

import random

from pg_vectorize_spark.operators.dedup import (
    connected_components,
    dedup_survivors_transitive,
)


def _bfs_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comp: dict[int, int] = {}
    for start in adj:
        if start in comp:
            continue
        seen = {start}
        stack = [start]
        while stack:
            n = stack.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        label = min(seen)
        for n in seen:
            comp[n] = label
    return comp


def test_chain_merges_transitively(spark):
    # A~B, B~C, C~D: all one component even though A~D never paired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_random_graph_matches_bfs(spark):
    rng = random.Random(7)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(60), rng.randrange(60)) for _ in range(80)
            )
            if a != b
        }
    )
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    expected = _bfs_components(edges)
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_transitive_survivors(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a_id long, b_id long"
    )
    surv = dedup_survivors_transitive(df, "doc_id", pairs)
    assert {r["doc_id"] for r in surv.collect()} == {1, 4, 5}


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(pairs).count() == 0


def test_chain_200_converges_logarithmically(spark):
    """Scale guard: a 200-node duplicate chain (diameter 199) must collapse
    in O(log^2 n) large-star/small-star rounds, not O(diameter) — the
    difference between ~6 and ~200 shuffle rounds on a 100 TB boilerplate
    chain."""
    from pg_vectorize_spark.operators.dedup import _alternating_cc

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "a_id long, b_id long"
    )
    edges = pairs.selectExpr("a_id as u", "b_id as v")
    star, rounds, converged = _alternating_cc(edges, 12)
    assert converged, "chain-200 did not converge in 12 rounds"
    assert rounds <= 8, f"chain-200 took {rounds} rounds (want <= 8)"
    # and the labels are still exactly right
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(201)}


def test_large_random_graph_matches_bfs(spark):
    """1,500-node sparse random graph (many components, some big): the
    alternating algorithm's labels must equal BFS exactly — coverage well
    beyond the 60-node smoke graph, at the scale where star/chain mixes
    and singleton-vs-center edge cases all occur."""
    rng = random.Random(42)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(1500), rng.randrange(1500))
                for _ in range(1200)
            )
            if a != b
        }
    )
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    expected = _bfs_components(edges)
    # local_max_edges=0 forces the distributed alternating-star path —
    # the default would take the driver-side union-find shortcut here
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs, local_max_edges=0).collect()
    }
    assert got == expected


def test_shared_leaf_two_centers_regression(spark):
    """Regression (review-found): a leaf attached to two centers after one
    round — pairs (1,10),(2,11),(5,10),(5,11) — must NOT be declared
    converged (the old chain-only test stopped early, splitting the
    component and double-labeling node 5)."""
    pairs = spark.createDataFrame(
        [(1, 10), (2, 11), (5, 10), (5, 11)], "a_id long, b_id long"
    )
    labels = connected_components(pairs, local_max_edges=0).collect()
    got = {}
    for r in labels:
        assert r["id"] not in got, f"duplicate label rows for {r['id']}"
        got[r["id"]] = r["component"]
    assert got == {1: 1, 2: 1, 5: 1, 10: 1, 11: 1}


class TestLocalPathParity:
    """The driver-side union-find fast path must be bit-identical to the
    distributed alternating-star path — same (id, component) set, same
    schema — on every graph shape (chains, stars, singletons from
    self-pairs, string keys)."""

    def _both(self, spark, pairs):
        local = connected_components(pairs)  # default takes the fast path
        dist = connected_components(pairs, local_max_edges=0)
        assert local.schema == dist.schema
        return (
            sorted((r["id"], r["component"]) for r in local.collect()),
            sorted((r["id"], r["component"]) for r in dist.collect()),
        )

    @pytest.mark.slow
    def test_random_graphs(self, spark):
        rng = random.Random(99)
        for trial in range(3):
            edges = sorted(
                {
                    (rng.randrange(300), rng.randrange(300))
                    for _ in range(250)
                }
            )  # self-pairs allowed: they register singleton nodes
            pairs = spark.createDataFrame(edges, "a_id long, b_id long")
            local, dist = self._both(spark, pairs)
            assert local == dist, f"trial {trial} diverged"
            expected = _bfs_components([(a, b) for a, b in edges if a != b])
            for a, b in edges:
                if a == b and a not in expected:
                    expected[a] = a  # self-pair-only singleton
            assert dict(local) == expected

    def test_string_keys(self, spark):
        # Spark min() on strings is UTF-8 byte order; Python compares code
        # points — the orders agree, and this pins it
        pairs = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("x", "x"), ("z", "y")],
            "a_id string, b_id string",
        )
        local, dist = self._both(spark, pairs)
        assert local == dist
        assert dict(local) == {
            "a": "a", "b": "a", "c": "a", "x": "x", "y": "y", "z": "y",
        }

    def test_self_pairs_only(self, spark):
        pairs = spark.createDataFrame(
            [(7, 7), (9, 9)], "a_id long, b_id long"
        )
        local, dist = self._both(spark, pairs)
        assert local == dist == [(7, 7), (9, 9)]

    def test_empty_local(self, spark):
        pairs = spark.createDataFrame([], "a_id long, b_id long")
        assert connected_components(pairs).count() == 0
