"""Spatial kernels: grid-partitioned distance self-join (PBSM with
canonical-cell duplicate avoidance) and L1 kNN — the exactly-once
contract, the boundary pair at exactly r, the cross-cell pair, the
grid-edge clip, and the kNN tie-break all pinned on constructed
points; the grid plan is pinned EQUAL to the brute-force O(n^2)
answer on a hashed key range."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from documentai_ray.stages.spatial import (
    EXTENT,
    _pairs_frame,
    grid_pair_join,
    hash_xy,
    knn_l1,
)


def _brute_pairs(keys: np.ndarray, radius: int):
    x, y = hash_xy(keys)
    out = set()
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if (abs(int(x[i] - x[j])) <= radius
                    and abs(int(y[i] - y[j])) <= radius):
                a, b = sorted((int(keys[i]), int(keys[j])))
                out.add((a, b))
    return out


class TestHashXY:
    def test_high_bits_not_lattice(self):
        """The shipped hash takes the TOP 10 bits; the low bits of a
        multiplicative hash are the lattice x = 433k mod 1024 with y
        a pure function of x.  Pin that the shipped y is NOT a
        function of x: some two keys share x but differ in y."""
        keys = np.arange(2000, dtype=np.int64)
        x, y = hash_xy(keys)
        seen: dict[int, int] = {}
        clash = False
        for xi, yi in zip(x.tolist(), y.tolist()):
            if xi in seen and seen[xi] != yi:
                clash = True
                break
            seen[xi] = yi
        assert clash
        assert 0 <= x.min() and x.max() < EXTENT
        assert 0 <= y.min() and y.max() < EXTENT


class TestGridPairJoin:
    def test_matches_brute_force(self, ray_session):
        """The grid plan returns EXACTLY the brute-force pair set on
        500 hashed keys (recall AND precision, the PBSM contract)."""
        import ray.data

        keys = np.arange(500, dtype=np.int64)
        ds = ray.data.from_arrow(
            pa.table({"c_custkey": pa.array(keys, pa.int64())}))
        got = grid_pair_join(ds, "c_custkey", radius=16).to_pandas()
        got_pairs = set(zip(got["a"].tolist(), got["b"].tolist()))
        assert got_pairs == _brute_pairs(keys, 16)
        # exactly-once: no duplicate pair rows anywhere
        assert len(got) == len(got_pairs)

    def test_distances_exact(self, ray_session):
        import ray.data

        keys = np.arange(500, dtype=np.int64)
        x, y = hash_xy(keys)
        ds = ray.data.from_arrow(
            pa.table({"c_custkey": pa.array(keys, pa.int64())}))
        got = grid_pair_join(ds, "c_custkey", radius=16).to_pandas()
        for _, r in got.head(20).iterrows():
            dx = abs(int(x[r["a"]] - x[r["b"]]))
            dy = abs(int(y[r["a"]] - y[r["b"]]))
            assert r["d_linf"] == max(dx, dy)
            assert r["d_l1"] == dx + dy


class TestPairsFrame:
    """Direct pins on the in-bucket kernel with constructed points —
    no hashing, full control of geometry."""

    def _run(self, pts, radius=16):
        """pts = [(k, x, y)]; replicate exactly as the stage does and
        run every bucket through _pairs_frame."""
        import pandas as pd

        s = radius
        n_cells = (EXTENT + s - 1) // s
        rows = []
        for k, x, y in pts:
            cx, cy = x // s, y // s
            for dx in (0, 1):
                for dy in (0, 1):
                    gx, gy = cx - dx, cy - dy
                    if gx >= 0 and gy >= 0:
                        rows.append((gx * n_cells + gy, k, x, y))
        df = pd.DataFrame(rows, columns=["cell", "k", "x", "y"])
        return _pairs_frame(df, radius, s, n_cells)

    def test_boundary_pair_at_exactly_r(self):
        """(0,0) and (16,16): L-inf = 16 = r — IN (closed ball)."""
        out = self._run([(1, 0, 0), (2, 16, 16)])
        assert len(out) == 1
        assert out.loc[0, "d_linf"] == 16 and out.loc[0, "d_l1"] == 32

    def test_just_outside(self):
        out = self._run([(1, 0, 0), (2, 17, 0)])
        assert len(out) == 0

    def test_cross_cell_pair_emitted_once(self):
        """(15,15) and (17,17) live in DIFFERENT home cells; the pair
        qualifies and is emitted exactly once (canonical cell =
        (0,0), the min corner)."""
        out = self._run([(1, 15, 15), (2, 17, 17)])
        assert len(out) == 1
        assert (out.loc[0, "a"], out.loc[0, "b"]) == (1, 2)

    def test_dense_cell_clique(self):
        """4 coincident points -> all 6 pairs, once each."""
        out = self._run([(i, 100, 100) for i in range(4)])
        assert len(out) == 6
        assert set(out["d_linf"]) == {0}

    def test_grid_edge_no_negative_cells(self):
        """Points at (0,0) and (1023,1023) — corner replicas are
        clipped, nothing crashes, far pair not emitted."""
        out = self._run([(1, 0, 0), (2, EXTENT - 1, EXTENT - 1)])
        assert len(out) == 0


class TestKnnL1:
    def test_tie_break_by_key(self, ray_session):
        """Anchor equidistant from keys with equal L1: the smaller
        key wins the lower rank — pinned via the real hash by
        querying an anchor AT a known point and planting a second
        key hashing to the same cell distance."""
        import ray.data

        keys = np.arange(300, dtype=np.int64)
        x, y = hash_xy(keys)
        # anchor exactly at point of key 7 -> rank 1 is key 7, d 0
        anchors = [(0, int(x[7]), int(y[7]))]
        ds = ray.data.from_arrow(
            pa.table({"c_custkey": pa.array(keys, pa.int64())}))
        out = knn_l1(ds, "c_custkey", anchors, k=3)
        assert out.loc[0, "k"] == 7 and out.loc[0, "d_l1"] == 0
        # full answer == brute force with (d, key) lexicographic order
        d = np.abs(x - x[7]) + np.abs(y - y[7])
        order = np.lexsort((keys, d))[:3]
        assert out["k"].tolist() == keys[order].tolist()
        assert out["rank"].tolist() == [1, 2, 3]

    def test_partial_topk_parallelism_independent(self, ray_session):
        """Same answer at 1 block and at 8 blocks — the partial
        top-k merge is associative."""
        import ray.data

        keys = np.arange(400, dtype=np.int64)
        anchors = [(0, 512, 512), (1, 10, 1000)]
        t = pa.table({"c_custkey": pa.array(keys, pa.int64())})
        a = knn_l1(ray.data.from_arrow(t), "c_custkey", anchors)
        b = knn_l1(ray.data.from_arrow(t).repartition(8),
                   "c_custkey", anchors)
        assert a.values.tolist() == b.values.tolist()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
