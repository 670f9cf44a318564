"""Integer-exact PageRank."""

from __future__ import annotations

import pyarrow as pa


def _ref_pagerank(edges, nodes, iters, out_deg):
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += r[a] // out_deg
        r = {n: 150_000 + (850_000 * s[n]) // 1_000_000 for n in nodes}
    return r


def test_pagerank_matches_reference(ray_session):
    import ray.data

    from documentai_ray.stages.graph import pagerank_int

    nodes = list(range(6))
    edges = [(i, (i * 7 + 1) % 6) for i in nodes] + \
            [(i, (i * 13 + 2) % 6) for i in nodes]
    e = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    n = pa.table({"node": pa.array(nodes, pa.int64())})
    out = pagerank_int(ray.data.from_arrow(e), ray.data.from_arrow(n),
                       iters=3, out_deg=2, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["rank_ppm"]))
    assert got == _ref_pagerank(edges, nodes, 3, 2)


def test_pagerank_sink_node_gets_base(ray_session):
    import ray.data

    from documentai_ray.stages.graph import pagerank_int

    # node 2 has no in-edges -> rank falls to the base term
    e = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                  "dst": pa.array([1, 0, 0], pa.int64())})
    n = pa.table({"node": pa.array([0, 1, 2], pa.int64())})
    out = pagerank_int(ray.data.from_arrow(e), ray.data.from_arrow(n),
                       iters=1, out_deg=1, num_partitions=2).to_pandas()
    got = dict(zip(out["node"], out["rank_ppm"]))
    assert got[2] == 150_000
    assert got[0] == 150_000 + (850_000 * 2_000_000) // 1_000_000


def _mk_ptr_table(ptr: dict[int, int]) -> pa.Table:
    return pa.table({"node": pa.array(list(ptr.keys()), pa.int64()),
                     "ptr": pa.array(list(ptr.values()), pa.int64())})


def test_resolve_pointers_irregular_chains(ray_session):
    import ray.data

    from documentai_ray.stages.graph import resolve_pointers

    # forest with chain lengths 0..4 plus a fan-in (two nodes -> one hop)
    ptr = {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 5, 6: 5, 7: 5, 8: 6, 9: 8}
    out = resolve_pointers(ray.data.from_arrow(_mk_ptr_table(ptr)),
                           iters=3, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["ptr"]))
    want = {}
    for n in ptr:
        cur = n
        while ptr[cur] != cur:
            cur = ptr[cur]
        want[n] = cur
    assert got == want
    assert len(out) == len(ptr)


def test_resolve_pointers_exact_power_boundary(ray_session):
    import ray.data

    from documentai_ray.stages.graph import resolve_pointers

    # a single chain of length exactly 2**iters is fully resolved;
    # length 2**iters + 1 is NOT (documented contract)
    n = 9  # chain 8 -> 7 -> ... -> 0, lengths up to 8
    ptr = {i: max(i - 1, 0) for i in range(n)}
    ds = ray.data.from_arrow(_mk_ptr_table(ptr))
    out3 = resolve_pointers(ds, iters=3, num_partitions=2).to_pandas()
    got3 = dict(zip(out3["node"], out3["ptr"]))
    assert got3[8] == 0 and got3[1] == 0
    # with only 2 rounds (covers 4 hops) node 8 stops at 8-4=4
    out2 = resolve_pointers(ds, iters=2, num_partitions=2).to_pandas()
    got2 = dict(zip(out2["node"], out2["ptr"]))
    assert got2[8] == 4 and got2[4] == 0


def test_triangle_counts_known_graph(ray_session):
    import ray.data

    from documentai_ray.stages.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, apexes 0,0,0,1) + pendant edge +
    # duplicate/self-loop noise that the orient/distinct pass must drop
    edges = [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (2, 3), (1, 3),
             (3, 4), (2, 2), (0, 1)]
    t = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    out = triangle_counts(ray.data.from_arrow(t),
                          num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == {0: 3, 1: 1}


def test_triangle_counts_no_triangles(ray_session):
    import ray.data

    from documentai_ray.stages.graph import triangle_counts

    t = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                  "dst": pa.array([1, 2, 3], pa.int64())})
    out = triangle_counts(ray.data.from_arrow(t),
                          num_partitions=2).to_pandas()
    assert len(out) == 0


class TestBfsKhop:
    def test_min_depth_and_reachability(self, ray_session):
        from documentai_ray.stages.graph import bfs_khop
        # 0->1->2->3->4 chain plus shortcut 0->2: node 2 is depth 1 (min
        # wins over the 2-hop path); node 4 is beyond k=3; node 9 is
        # disconnected and must not appear.
        edges = ray_session.data.from_items(
            [{"src": 0, "dst": 1}, {"src": 1, "dst": 2},
             {"src": 2, "dst": 3}, {"src": 3, "dst": 4},
             {"src": 0, "dst": 2}, {"src": 9, "dst": 9}])
        seeds = ray_session.data.from_items([{"node": 0}])
        out = bfs_khop(edges, seeds, k=3, num_partitions=4).to_pandas()
        got = dict(zip(out["node"], out["depth"]))
        assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}

    def test_seed_stays_depth_zero_on_cycle(self, ray_session):
        from documentai_ray.stages.graph import bfs_khop
        # cycle 0->1->0: the seed is re-reached at depth 2 but min is 0.
        edges = ray_session.data.from_items(
            [{"src": 0, "dst": 1}, {"src": 1, "dst": 0}])
        seeds = ray_session.data.from_items([{"node": 0}])
        out = bfs_khop(edges, seeds, k=2, num_partitions=2).to_pandas()
        got = dict(zip(out["node"], out["depth"]))
        assert got == {0: 0, 1: 1}


class TestCooccurrencePairs:
    def test_pair_counts_with_dups_and_support(self, ray_session):
        from documentai_ray.stages.graph import cooccurrence_pairs
        rows = [
            # basket 1: items a,b,c (b listed twice -> distinct first)
            {"bk": 1, "it": "a"}, {"bk": 1, "it": "b"},
            {"bk": 1, "it": "b"}, {"bk": 1, "it": "c"},
            # basket 2: a,b
            {"bk": 2, "it": "a"}, {"bk": 2, "it": "b"},
            # basket 3: a,c
            {"bk": 3, "it": "a"}, {"bk": 3, "it": "c"},
            # basket 4: singleton -> no pairs
            {"bk": 4, "it": "z"},
        ]
        ds = ray_session.data.from_items(rows).repartition(4)
        out = cooccurrence_pairs(ds, basket_col="bk", item_col="it",
                                 min_support=2,
                                 num_partitions=3).to_pandas()
        got = {(r.item_a, r.item_b): r.n for r in out.itertuples()}
        # (a,b): baskets 1,2; (a,c): baskets 1,3; (b,c): only basket 1
        assert got == {("a", "b"): 2, ("a", "c"): 2}

    def test_max_basket_guard_raises(self, ray_session):
        import pytest
        from documentai_ray.stages.graph import cooccurrence_pairs
        rows = [{"bk": 1, "it": f"i{j}"} for j in range(12)]
        ds = ray_session.data.from_items(rows)
        with pytest.raises(Exception, match="max_basket"):
            cooccurrence_pairs(ds, basket_col="bk", item_col="it",
                               max_basket=10).materialize()


class TestSsspBounded:
    def test_two_hop_beats_heavy_direct_edge(self, ray_session):
        from documentai_ray.stages.graph import sssp_bounded
        edges = ray_session.data.from_items([
            {"src": 0, "dst": 1, "w": 10},   # heavy direct
            {"src": 0, "dst": 2, "w": 1},
            {"src": 2, "dst": 1, "w": 1},    # 2-hop cost 2 wins
            {"src": 1, "dst": 3, "w": 1},
            {"src": 9, "dst": 0, "w": 7},    # edge INTO the seed: unused
        ])
        seeds = ray_session.data.from_items([{"node": 0}])
        out = sssp_bounded(edges, seeds, rounds=3,
                           num_partitions=2).to_pandas()
        got = dict(zip(out["node"], out["dist"]))
        assert got == {0: 0, 2: 1, 1: 2, 3: 3}

    def test_round_budget_limits_reach_and_cost(self, ray_session):
        from documentai_ray.stages.graph import sssp_bounded
        # chain 0-1-2-3-4 (w=1 each) plus a shortcut 0->4 of cost 10:
        # rounds=2 can't see the cheap 4-hop chain, so 4 costs 10
        edges = ray_session.data.from_items(
            [{"src": i, "dst": i + 1, "w": 1} for i in range(4)]
            + [{"src": 0, "dst": 4, "w": 10}])
        seeds = ray_session.data.from_items([{"node": 0}])
        out2 = sssp_bounded(edges, seeds, rounds=2,
                            num_partitions=2).to_pandas()
        got2 = dict(zip(out2["node"], out2["dist"]))
        assert got2[4] == 10 and got2[2] == 2 and 3 not in got2 or got2.get(3) == 3
        # with 4 rounds the chain wins
        out4 = sssp_bounded(edges, seeds, rounds=4,
                            num_partitions=2).to_pandas()
        got4 = dict(zip(out4["node"], out4["dist"]))
        assert got4[4] == 4


class TestDagLayers:
    def test_longest_path_layer(self, ray_session):
        from documentai_ray.stages.graph import dag_layers
        # diamond + tail: 0->1->3, 0->2->3 with an extra hop 2->4->3
        # longest path to 3 goes through the 3-edge branch.
        edges = ray_session.data.from_items([
            {"src": 0, "dst": 1}, {"src": 0, "dst": 2},
            {"src": 1, "dst": 3}, {"src": 2, "dst": 4},
            {"src": 4, "dst": 3},
        ])
        nodes = ray_session.data.from_items(
            [{"node": i} for i in range(5)])
        out = dag_layers(edges, nodes, rounds=4,
                         num_partitions=2).to_pandas()
        got = dict(zip(out["node"], out["layer"]))
        assert got == {0: 0, 1: 1, 2: 1, 4: 2, 3: 3}

    def test_isolated_nodes_are_sources(self, ray_session):
        from documentai_ray.stages.graph import dag_layers
        edges = ray_session.data.from_items([{"src": 0, "dst": 1}])
        nodes = ray_session.data.from_items(
            [{"node": 0}, {"node": 1}, {"node": 9}])
        out = dag_layers(edges, nodes, rounds=2,
                         num_partitions=2).to_pandas()
        got = dict(zip(out["node"], out["layer"]))
        assert got == {0: 0, 1: 1, 9: 0}

    def test_insufficient_rounds_underestimate(self, ray_session):
        from documentai_ray.stages.graph import dag_layers
        # chain of 4 edges; rounds=2 caps the deepest node at 2
        edges = ray_session.data.from_items(
            [{"src": i, "dst": i + 1} for i in range(4)])
        nodes = ray_session.data.from_items(
            [{"node": i} for i in range(5)])
        out = dag_layers(edges, nodes, rounds=2,
                         num_partitions=2).to_pandas()
        got = dict(zip(out["node"], out["layer"]))
        assert got[4] == 2          # truncated by the round budget
        out4 = dag_layers(edges, nodes, rounds=4,
                          num_partitions=2).to_pandas()
        assert dict(zip(out4["node"], out4["layer"]))[4] == 4


class TestPagerankIrregular:
    def test_degree_table_path_matches_hand_calc(self, ray_session):
        from documentai_ray.stages.graph import pagerank_int
        # star: 0 -> 1, 0 -> 2 (deg 2); 1 -> 0 (deg 1); 2 dangling-ish
        # has no out-edges (its mass vanishes, documented semantics).
        edges = ray_session.data.from_items([
            {"src": 0, "dst": 1}, {"src": 0, "dst": 2},
            {"src": 1, "dst": 0},
        ])
        nodes = ray_session.data.from_items(
            [{"node": 0}, {"node": 1}, {"node": 2}])
        out = pagerank_int(edges, nodes, iters=1, out_deg=None,
                           num_partitions=2).to_pandas()
        got = dict(zip(out["node"], out["rank_ppm"]))
        # r0 = 1e6 each. contributions: 0 sends 500000 to 1 and 2;
        # 1 sends 1000000 to 0. update = 150000 + 850000*s // 1e6.
        assert got == {0: 150000 + 850000, 1: 150000 + 425000,
                       2: 150000 + 425000}

    def test_constant_path_equals_degree_path_on_regular_graph(
            self, ray_session):
        from documentai_ray.stages.graph import pagerank_int
        edges = ray_session.data.from_items(
            [{"src": i, "dst": (i + 1) % 4} for i in range(4)]
            + [{"src": i, "dst": (i + 2) % 4} for i in range(4)])
        nodes = ray_session.data.from_items(
            [{"node": i} for i in range(4)])
        a = pagerank_int(edges, nodes, iters=2, out_deg=2,
                         num_partitions=2).to_pandas()
        b = pagerank_int(edges, nodes, iters=2, out_deg=None,
                         num_partitions=2).to_pandas()
        da = dict(zip(a["node"], a["rank_ppm"]))
        db = dict(zip(b["node"], b["rank_ppm"]))
        assert da == db


class TestKCore:
    def _edges(self, ray_session, pairs):
        import pyarrow as pa
        return ray_session.data.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "dst": pa.array([p[1] for p in pairs], pa.int64())}))

    def test_pendant_chain_peels_cascade(self, ray_session):
        """Triangle 0-1-2 with pendant chain 2-3-4-5: one degree pass
        removes only node 5; the cascade must continue until the
        triangle alone remains."""
        from documentai_ray.stages.graph import kcore_nodes
        e = self._edges(ray_session, [(0, 1), (1, 2), (2, 0),
                                      (2, 3), (3, 4), (4, 5)])
        out = kcore_nodes(e, k=2, rounds=5).to_pandas()
        got = dict(zip(out["node"], out["deg"]))
        assert got == {0: 2, 1: 2, 2: 2}

    def test_rounds_truncation_contract(self, ray_session):
        """rounds=1 performs exactly one peel: node 5 gone, node 4 left
        at degree 1 (the documented partial-peel semantics)."""
        from documentai_ray.stages.graph import kcore_nodes
        e = self._edges(ray_session, [(0, 1), (1, 2), (2, 0),
                                      (2, 3), (3, 4), (4, 5)])
        out = kcore_nodes(e, k=2, rounds=1).to_pandas()
        got = dict(zip(out["node"], out["deg"]))
        assert got == {0: 2, 1: 2, 2: 3, 3: 2, 4: 1}

    def test_whole_graph_dissolves(self, ray_session):
        from documentai_ray.stages.graph import kcore_nodes
        e = self._edges(ray_session, [(0, 1), (1, 2)])  # path: no 2-core
        out = kcore_nodes(e, k=2, rounds=4).to_pandas()
        assert len(out) == 0

    def test_rejects_bad_k(self, ray_session):
        import pytest
        from documentai_ray.stages.graph import kcore_nodes
        with pytest.raises(ValueError):
            kcore_nodes(self._edges(ray_session, [(0, 1)]), k=0,
                        rounds=1)


class TestClusteringCoefficient:
    def _edges(self, ray_session, pairs):
        import pyarrow as pa
        t = pa.table({"src": pa.array([a for a, b in pairs], pa.int64()),
                      "dst": pa.array([b for a, b in pairs], pa.int64())})
        import ray
        return ray.data.from_arrow(t)

    def test_triangle_is_one(self, ray_session):
        from documentai_ray.stages.graph import clustering_coefficient
        out = clustering_coefficient(
            self._edges(ray_session, [(0, 1), (1, 2), (0, 2)]),
            num_partitions=4).to_pandas().iloc[0]
        assert (out["n_nodes"], out["n_edges"], out["n_wedges"],
                out["n_triangles"], out["clustering_ppm"]) \
            == (3, 3, 3, 1, 1_000_000)

    def test_star_is_zero_with_wedges(self, ray_session):
        """A 3-star has 3 wedges and no triangle -> 0 ppm (not a
        division error)."""
        from documentai_ray.stages.graph import clustering_coefficient
        out = clustering_coefficient(
            self._edges(ray_session, [(0, 1), (0, 2), (0, 3)]),
            num_partitions=4).to_pandas().iloc[0]
        assert (out["n_wedges"], out["n_triangles"],
                out["clustering_ppm"]) == (3, 0, 0)

    def test_duplicates_and_reversals_dedupe(self, ray_session):
        """Each triangle edge given twice in both directions plus a
        self-loop: identical result to the clean triangle."""
        from documentai_ray.stages.graph import clustering_coefficient
        pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0),
                 (0, 1), (2, 2)]
        out = clustering_coefficient(
            self._edges(ray_session, pairs),
            num_partitions=4).to_pandas().iloc[0]
        assert (out["n_edges"], out["n_triangles"],
                out["clustering_ppm"]) == (3, 1, 1_000_000)
