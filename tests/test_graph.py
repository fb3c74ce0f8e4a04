"""Weighted PageRank (operators/graph.py) — exact equality vs a
pure-Python scaled-long reference, structural sanity on known graphs,
and layout independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.graph import (
    weighted_pagerank,
)


def _round_half_up(x):
    # Spark ROUND semantics: decimal HALF_UP over the shortest repr
    # (Python round() is half-even — the probed house rule)
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def _py_pagerank(edges, iterations=3, damping=0.85, scale=10**9):
    """Mirror of the operator: same pinned double expression per edge,
    same integer sums, same HALF_UP rounding."""
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    base = round((1.0 - damping) * scale)
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        mass = {n: 0 for n in nodes}
        for s, d, w in edges:
            c = _round_half_up(
                damping * float(r[s]) * float(w) / float(out_w[s])
            )
            mass[d] += c
        r = {n: base + mass[n] for n in nodes}
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(
        edges, "src string, dst string, weight long"
    )


class TestPageRank:
    def test_matches_python_reference_exactly(self, spark):
        # weighted digraph with a cycle, a hub, and a dangling sink
        edges = [
            ("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
            ("c", "a", 5), ("c", "d", 1), ("b", "d", 4),
            ("e", "a", 2),  # e has no in-edges, d has no out-edges
        ]
        got = {
            r["node"]: r["rank_scaled"]
            for r in weighted_pagerank(
                _edges_df(spark, edges), iterations=4
            ).collect()
        }
        assert got == _py_pagerank(edges, iterations=4)

    def test_star_graph_center_dominates(self, spark):
        edges = [(f"leaf{i}", "center", 1) for i in range(10)] + [
            ("center", f"leaf{i}", 1) for i in range(10)
        ]
        ranks = {
            r["node"]: r["pagerank"]
            for r in weighted_pagerank(
                _edges_df(spark, edges), iterations=5
            ).collect()
        }
        assert all(
            ranks["center"] > ranks[f"leaf{i}"] for i in range(10)
        )

    def test_dangling_node_keeps_base_rank_only_when_unlinked(self, spark):
        # d is a pure sink: it accumulates mass but redistributes none;
        # e -> f chain: f's second-round input decays (e's rank fell to
        # base after round 1)
        edges = [("a", "d", 1), ("b", "d", 1), ("e", "f", 1)]
        got = {
            r["node"]: r["rank_scaled"]
            for r in weighted_pagerank(
                _edges_df(spark, edges), iterations=3
            ).collect()
        }
        assert got == _py_pagerank(edges, iterations=3)
        base = round(0.15 * 10**9)
        # sources with no in-edges settle at exactly the base rank
        for n in ("a", "b", "e"):
            assert got[n] == base
        assert got["d"] > got["f"] > base

    def test_weights_shift_rank(self, spark):
        # b and c identical except a sends 9x the weight to b
        edges = [("a", "b", 9), ("a", "c", 1)]
        got = {
            r["node"]: r["rank_scaled"]
            for r in weighted_pagerank(
                _edges_df(spark, edges), iterations=2
            ).collect()
        }
        assert got == _py_pagerank(edges, iterations=2)
        assert got["b"] > got["c"]

    def test_layout_independent(self, spark):
        edges = [
            (f"n{i}", f"n{(i * 7 + 3) % 50}", (i % 5) + 1)
            for i in range(200)
        ]
        df = _edges_df(spark, edges)
        a = sorted(map(tuple, weighted_pagerank(df).collect()))
        b = sorted(
            map(
                tuple,
                weighted_pagerank(df.repartition(13, "dst")).collect(),
            )
        )
        assert a == b

    def test_validation(self, spark):
        df = _edges_df(spark, [("a", "b", 1)])
        with pytest.raises(ValueError):
            weighted_pagerank(df, iterations=0)
        with pytest.raises(ValueError):
            weighted_pagerank(df, damping=1.0)

    def test_zero_weight_edges_dropped_not_divide_by_zero(self, spark):
        # a source whose weights sum to 0 after the long cast (e.g.
        # fractional weights < 0.5 truncating to 0) used to raise
        # DIVIDE_BY_ZERO (ANSI) / ZeroDivisionError (fast path); such
        # edges now drop, so 'z' is dangling and 'gone' (only in
        # dropped edges) leaves the graph entirely
        edges = [("a", "b", 2), ("z", "a", 0), ("z", "gone", 0)]
        df = _edges_df(spark, edges)
        for kw in ({}, {"small_graph_max": 0}):
            got = {
                r["node"]: r["rank_scaled"]
                for r in weighted_pagerank(df, iterations=2, **kw).collect()
            }
            # 'z' and 'gone' appear only in dropped edges: the result
            # is exactly the graph without them
            want = _py_pagerank([("a", "b", 2)], iterations=2)
            assert got == want


class TestFastPath:
    def test_fastpath_equals_distributed_on_rounding_tie(self, spark):
        # hub with 256 unit out-edges: round 1 contribution is
        # 0.85e9/256 = 3320312.5 — an exact .5 tie where half-even
        # rounding would diverge from Spark's HALF_UP
        edges = [("hub", f"leaf{i}", 1) for i in range(256)] + [
            (f"leaf{i}", "hub", 1) for i in range(256)
        ]
        df = _edges_df(spark, edges)
        fast = sorted(
            map(tuple, weighted_pagerank(df, iterations=3).collect())
        )
        dist = sorted(
            map(
                tuple,
                weighted_pagerank(
                    df, iterations=3, small_graph_max=0
                ).collect(),
            )
        )
        assert fast == dist
        assert fast == sorted(
            (n, r, r / 1e9)
            for n, r in _py_pagerank(edges, iterations=3).items()
        )

    def test_fastpath_equals_distributed_weighted(self, spark):
        edges = [
            (f"n{i}", f"n{(i * 11 + 5) % 40}", (i % 7) + 1)
            for i in range(300)
        ]
        df = _edges_df(spark, edges)
        fast = sorted(
            map(tuple, weighted_pagerank(df, iterations=4).collect())
        )
        dist = sorted(
            map(
                tuple,
                weighted_pagerank(
                    df, iterations=4, small_graph_max=0
                ).collect(),
            )
        )
        assert fast == dist


class TestTriangles:
    def test_clique_path_and_star(self, spark):
        from org_revue_de_presse_trends_spark.operators.graph import (
            triangle_stats,
        )

        # K4 on 0-3 (4 triangles, every node in 3), a path 10-11-12
        # (no triangles), a star 20-(21,22,23) (no triangles), plus a
        # duplicate and a self-loop that must be ignored
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        pairs = (
            k4
            + [(10, 11), (11, 12)]
            + [(20, 21), (20, 22), (20, 23)]
            + [(1, 0), (5, 5)]  # reversed duplicate + self-loop
        )
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
            for r in triangle_stats(df).collect()
        }
        for v in range(4):
            assert got[v] == (3, 3, 1.0)
        assert got[11] == (2, 0, 0.0)
        assert got[10] == (1, 0, 0.0)
        assert got[20] == (3, 0, 0.0)
        assert got[21] == (1, 0, 0.0)
        assert 5 not in got  # self-loop contributes nothing

    def test_partial_clustering_value(self, spark):
        from org_revue_de_presse_trends_spark.operators.graph import (
            triangle_stats,
        )

        # triangle 0-1-2 plus pendant 2-3: node 2 has deg 3, 1 triangle
        # -> clustering 2*1/(3*2) = 1/3 (rounded to 9dp)
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (0, 2), (2, 3)], "id_a long, id_b long"
        )
        got = {
            r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
            for r in triangle_stats(df).collect()
        }
        assert got[2] == (3, 1, 0.333333333)
        assert got[0] == (2, 1, 1.0)
        assert got[3] == (1, 0, 0.0)
