"""Distributed graph operators: integer-exact PageRank.

The canonical iterative *graph* computation over a Dataset (the join-
per-iteration shape k-means avoids): each iteration joins the edge list
against the current rank table, aggregates contributions per target, and
rebuilds the rank table — two key-projected exchanges per iteration,
never a driver-side materialization of the graph.

All arithmetic is INTEGER ppm: ranks start at 10⁶, a node's contribution
is ``r // out_deg`` (floor), and the damping update is
``150_000 + 850_000 · Σcontrib // 10⁶`` — no floats anywhere, so a SQL
oracle reproduces every iteration bit-exactly (float PageRank would
drift by summation order). The floor divisions lose ≤1 ppm per step —
irrelevant for ranking, essential for cross-engine determinism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAMP_PPM = 850_000
BASE_PPM = 150_000
SCALE = 1_000_000


def pagerank_int(edges_ds, nodes_ds, *, iters: int = 2, out_deg: int,
                 num_partitions: int = 32):
    """``edges_ds``: (src, dst) with every src having exactly ``out_deg``
    edges (the regular-graph contract; for irregular graphs join an
    out-degree table instead of the constant). ``nodes_ds``: (node).
    Returns (node, rank_ppm) after ``iters`` damped iterations."""
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    def init(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"node": batch.column("node").cast(pa.int64()),
                         "rank_ppm": pa.array(np.full(n, SCALE), pa.int64())})

    ranks = nodes_ds.map_batches(init, batch_format="pyarrow")

    for _ in range(iters):
        # contributions: edges ⋈ ranks on src → (dst, r // out_deg)
        tagged = edges_ds.map_batches(
            lambda b: pa.table({"node": b.column("src").cast(pa.int64()),
                                "dst": b.column("dst").cast(pa.int64())}),
            batch_format="pyarrow")
        joined = hash_join(tagged, ranks, on="node",
                           num_partitions=num_partitions)

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("rank_ppm").to_numpy()
            return pa.table({"node": batch.column("dst"),
                             "c": pa.array(r // out_deg, pa.int64())})

        # zero-row injection instead of a second join: every node
        # contributes a 0 so sink nodes survive the groupby with s=0 —
        # one exchange saved per iteration
        zeros = ranks.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "c": pa.array(np.zeros(len(b), np.int64),
                                              pa.int64())}),
            batch_format="pyarrow")
        sums = (joined.map_batches(contrib, batch_format="pyarrow")
                .union(zeros)
                .groupby("node").aggregate(Sum("c", alias_name="s")))

        def update(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy()
            new_r = BASE_PPM + (DAMP_PPM * s) // SCALE
            return pa.table({"node": batch.column("node").cast(pa.int64()),
                             "rank_ppm": pa.array(new_r, pa.int64())})

        ranks = sums.map_batches(update, batch_format="pyarrow").materialize()

    return ranks
