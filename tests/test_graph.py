"""PageRank (operators/graph.py): the distributed join/agg iteration
must agree with a numpy power iteration over the collected edge list,
conserve probability mass, and respect the trade graph's structure."""

from __future__ import annotations

import numpy as np

from xml_hive_spark.operators import all_queries
from xml_hive_spark.operators.graph import _DAMP, _ITERS, pagerank, trade_edges


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
    def test_matches_numpy_power_iteration(self, spark, sf_dir):
        edges = trade_edges(spark, sf_dir)
        pairs = [(r.src, r.dst) for r in edges.collect()]
        want = _numpy_pagerank(pairs, _DAMP, _ITERS)
        got = {r.node: r.rank for r in pagerank(edges).collect()}
        assert set(got) == set(want)
        for node, rank in got.items():
            assert abs(rank - want[node]) < 1e-9, node

    def test_mass_conserved_and_positive(self, spark, sf_dir):
        ranks = pagerank(trade_edges(spark, sf_dir)).collect()
        total = sum(r.rank for r in ranks)
        # mirrored edges → no dangling nodes → mass exactly conserved
        assert abs(total - 1.0) < 1e-9
        assert all(r.rank > 0 for r in ranks)

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
