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
