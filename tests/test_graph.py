"""PageRank (operators/graph.py): the distributed fixed-point
join/agg iteration must agree EXACTLY (integer units) with a
pure-Python replica over the collected edge list, track real-valued
power iteration within the quantization bound, conserve probability
mass up to the quantified floor loss, and respect the trade graph's
structure."""

from __future__ import annotations

import numpy as np

from xml_hive_spark.operators import all_queries
from xml_hive_spark.operators.graph import (
    _DAMP,
    _ITERS,
    _UNIT,
    pagerank,
    trade_edges,
)


def _fixed_point_pagerank(edge_pairs, damping, iters):
    """Pure-Python integer replica of the Spark recurrence: BIGINT
    units, floor division everywhere — must match Spark bit-for-bit."""
    dnum = round(damping * 100)
    nodes = sorted({a for a, _ in edge_pairs} | {b for _, b in edge_pairs})
    n = len(nodes)
    out: dict = {}
    for a, _ in edge_pairs:
        out[a] = out.get(a, 0) + 1
    tele = ((100 - dnum) * _UNIT) // (100 * n)
    r = {v: _UNIT // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edge_pairs:
            s[b] += r[a] // out[a]
        r = {v: tele + (dnum * s[v]) // 100 for v in nodes}
    return r


def _numpy_pagerank(edge_pairs, damping, iters):
    nodes = sorted({a for a, _ in edge_pairs} | {b for _, b in edge_pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edge_pairs:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        contrib = r / out
        for a, b in edge_pairs:
            nxt[idx[b]] += damping * contrib[idx[a]]
        r = nxt
    return dict(zip(nodes, r))


class TestPagerank:
    def test_exact_integer_parity(self, spark, sf_dir):
        """The distributed loop is bit-identical to the sequential
        integer replica — the property that makes the DuckDB oracle a
        full value hash."""
        edges = trade_edges(spark, sf_dir)
        pairs = [(r.src, r.dst) for r in edges.collect()]
        want = _fixed_point_pagerank(pairs, _DAMP, _ITERS)
        got = {r.node: r.rank_units for r in pagerank(edges).collect()}
        assert got == want

    def test_tracks_real_power_iteration(self, spark, sf_dir):
        """Quantization drift vs float power iteration stays inside the
        analytic bound (iters·(indeg+2)/UNIT ≪ 1e-6 here)."""
        edges = trade_edges(spark, sf_dir)
        pairs = [(r.src, r.dst) for r in edges.collect()]
        want = _numpy_pagerank(pairs, _DAMP, _ITERS)
        got = {r.node: r.rank for r in pagerank(edges).collect()}
        assert set(got) == set(want)
        for node, rank in got.items():
            assert abs(rank - want[node]) < 1e-6, node

    def test_mass_conserved_and_positive(self, spark, sf_dir):
        rows = pagerank(trade_edges(spark, sf_dir)).collect()
        total_units = sum(r.rank_units for r in rows)
        # mirrored edges → no dangling nodes → mass conserved up to the
        # floor loss: ≤1 unit per edge contribution + per-node damping
        # floor + teleport floor, per iteration.
        n_edges = trade_edges(spark, sf_dir).count()
        max_loss = _ITERS * (n_edges + 2 * len(rows) + 1)
        assert _UNIT - total_units <= max_loss
        assert total_units <= _UNIT
        assert all(r.rank_units > 0 for r in rows)

    def test_exact_parity_on_crafted_graph(self, spark):
        """Bit-exactness must hold on an asymmetric, skewed-degree graph
        too (hub, chain, and a 2-cycle — shapes the bipartite trade
        graph never produces), and for a non-default damping/iteration
        count. Edges are mirrored to satisfy the no-dangling contract."""
        once = [("a", "b"), ("a", "c"), ("a", "d"), ("d", "e"),
                ("e", "f"), ("b", "c")]
        pairs = once + [(y, x) for x, y in once]
        edges = spark.createDataFrame(pairs, "src string, dst string")
        want = _fixed_point_pagerank(pairs, 0.5, 3)
        got = {r.node: r.rank_units
               for r in pagerank(edges, damping=0.5, iters=3).collect()}
        assert got == want

    def test_damping_must_be_percent_exact(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "src string, dst string"
        )
        import pytest

        with pytest.raises(ValueError, match="multiple of 0.01"):
            pagerank(edges, damping=0.8503)

    def test_registry_query_shape(self, spark, sf_dir):
        out = all_queries()["graph_pagerank"].fn(spark, sf_dir).collect()
        assert len(out) == 20
        ranks = [r.rank for r in out]
        assert ranks == sorted(ranks, reverse=True)
        # the trade graph's hubs are suppliers (every customer buys from
        # many suppliers and vice versa, but supplier count is smaller →
        # higher in-mass per supplier)
        assert any(r.node.startswith("s") for r in out)


class TestBfsHops:
    def test_bfs_invariants(self, spark, sf_dir):
        """Hop levels must be BFS-consistent: exactly one source at
        hop 0 (the minimum co-purchase node), and every node at hop
        h > 0 has at least one neighbor at hop h-1 (parent witness)."""
        from xml_hive_spark.operators import all_queries
        from xml_hive_spark.operators.graph import copurchase_edges

        dist = {
            r.part_key: r.hops
            for r in all_queries()["graph_bfs_hops"].fn(spark, sf_dir).collect()
        }
        edges = copurchase_edges(spark, sf_dir).collect()
        nbrs: dict = {}
        for e in edges:
            nbrs.setdefault(e.u, set()).add(e.v)
        sources = [n for n, h in dist.items() if h == 0]
        assert sources == [min(n for e in edges for n in (e.u, e.v))]
        for node, h in dist.items():
            if h == 0:
                continue
            assert any(dist.get(p) == h - 1 for p in nbrs.get(node, ())), node
        # min-distance: no edge may shortcut a level by more than 1
        for e in edges:
            if e.u in dist and e.v in dist:
                assert abs(dist[e.u] - dist[e.v]) <= 1
