"""Spatial operators over integer point sets — the distributed-spatial
family: a grid-partitioned distance self-join (PBSM, Patel & DeWitt
1996) and an L1 k-nearest-neighbour scan.

Points are INTEGER coordinates (here: double-Knuth-hashed keys on a
1024x1024 grid), distances are Chebyshev (L-infinity) and Manhattan
(L1) — both exact integer metrics, so the whole family runs with ZERO
floors and lands bit-identically against a SQL mirror.

Scale story (the reason the family exists): a distance self-join is
O(n^2) naively; the grid decomposition with cell size s = radius makes
it a LOCAL join — each point is replicated to at most 4 cells (its own
and the <=3 lower neighbours that could be a pair's canonical cell),
cells are hash-bucketed into P partitions, and every pair is verified
and emitted in EXACTLY ONE cell (the pair's canonical cell = the cell
of the component-wise min corner), so no global dedup pass is needed.
The shuffle moves 4 small rows per point; the per-bucket work is one
vectorized self-merge on cell id whose size is bounded by density *
s^2 per cell — the documented contract is cell size ~ radius and
bounded point density, the same contract every distributed spatial
engine (SpatialHadoop, Sedona) ships.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KNUTH = 2654435761
MOD32 = 1 << 32
EXTENT = 1024  # grid is [0, EXTENT) x [0, EXTENT)


def hash_xy(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double Knuth hash key -> (x, y) on the integer grid.

    x = TOP 10 bits of (k * KNUTH mod 2^32), y = top 10 bits of
    (h_x * KNUTH + 12345 mod 2^32).  Two deliberate choices, both
    probed before shipping: the second hash re-multiplies the FULL
    32-bit first hash (adding a constant alone would leave y = x + c
    mod EXTENT, a perfectly correlated diagonal), and coordinates
    come from the HIGH bits — the low bits of a multiplicative hash
    are a lattice (x = 433k mod 1024 for sequential keys, and y a
    pure function of x), Knuth's own high-bits rule.  All products
    fit uint64 (max (2^32-1) * KNUTH ~ 1.14e19 < 2^64), so the SQL
    mirror reproduces them with one HUGEINT cast and no wraparound."""
    k = keys.astype(np.uint64)
    hx = (k * np.uint64(KNUTH)) % np.uint64(MOD32)
    hy = (hx * np.uint64(KNUTH) + np.uint64(12345)) % np.uint64(MOD32)
    shift = np.uint64((MOD32 // EXTENT).bit_length() - 1)  # 22
    return ((hx >> shift).astype(np.int64),
            (hy >> shift).astype(np.int64))


def _pairs_frame(df: pd.DataFrame, radius: int, cell_size: int,
                 n_cells: int) -> pd.DataFrame:
    """Vectorized in-bucket pair finder: self-merge on cell id, then
    filter to (a < b, L-inf <= radius, THIS cell is the pair's
    canonical cell).  The canonical-cell condition is the
    duplicate-avoidance trick: a pair within radius spans cells that
    differ by <= 1 per axis, both endpoints were replicated into the
    min-corner cell, and only that one cell emits it."""
    m = df.merge(df, on="cell", suffixes=("_a", "_b"))
    m = m[m["k_a"] < m["k_b"]]
    dx = (m["x_a"] - m["x_b"]).abs()
    dy = (m["y_a"] - m["y_b"]).abs()
    m = m.assign(dx=dx, dy=dy)
    m = m[(m["dx"] <= radius) & (m["dy"] <= radius)]
    canon = (np.minimum(m["x_a"], m["x_b"]) // cell_size) * n_cells \
        + (np.minimum(m["y_a"], m["y_b"]) // cell_size)
    m = m[m["cell"] == canon]
    out = pd.DataFrame({
        "a": m["k_a"], "b": m["k_b"],
        "d_linf": np.maximum(m["dx"], m["dy"]),
        "d_l1": m["dx"] + m["dy"]})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def grid_pair_join(ds, key_col: str, *, radius: int = 16,
                   num_buckets: int = 32):
    """All pairs of hashed points within L-infinity ``radius``, via
    the PBSM grid decomposition with cell size = radius.

    Plan: map_batches hashes keys to (x, y), replicates each point to
    the <= 4 candidate canonical cells (own cell and lower
    neighbours, clipped at the grid edge — negative cells can never
    be a canonical min-corner), keyed by a Knuth-hashed cell bucket;
    ONE shuffle of (bucket, cell, k, x, y) rows; per bucket one
    vectorized pandas self-merge emits each qualifying pair exactly
    once.  Group count is bounded by ``num_buckets``, never by cell
    or key cardinality."""
    cell_size = radius
    n_cells = (EXTENT + cell_size - 1) // cell_size

    def replicate(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy().astype(np.int64)
        x, y = hash_xy(keys)
        cx, cy = x // cell_size, y // cell_size
        parts = []
        for dx_ in (0, 1):
            for dy_ in (0, 1):
                gx, gy = cx - dx_, cy - dy_
                keep = (gx >= 0) & (gy >= 0)
                cell = gx[keep] * n_cells + gy[keep]
                parts.append(pd.DataFrame({
                    "cell": cell, "k": keys[keep],
                    "x": x[keep], "y": y[keep]}))
        rep = pd.concat(parts, ignore_index=True)
        rep["bucket"] = ((rep["cell"].to_numpy().astype(np.uint64)
                          * np.uint64(KNUTH)) % np.uint64(MOD32)
                         ).astype(np.int64) % num_buckets
        for c in rep.columns:
            rep[c] = rep[c].astype("int64")
        return pa.Table.from_pandas(rep, preserve_index=False) \
                       .replace_schema_metadata(None)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_frame(g, radius, cell_size, n_cells)

    return (ds.map_batches(replicate, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(bucket_pairs, batch_format="pandas"))


def knn_l1(ds, key_col: str, anchors: list[tuple[int, int, int]],
           k: int = 3):
    """k nearest points to each anchor under Manhattan (L1) distance,
    ties broken by smaller key — top-k as an AGGREGATION: each batch
    emits only its local k best rows per anchor (a partial top-k, the
    ``topk_similarity`` discipline), the driver merges the tiny
    partial table.  ``anchors`` is [(anchor_id, ax, ay), ...] —
    a handful of rows shipped by closure, never a shuffle."""
    aid = np.array([a[0] for a in anchors], dtype=np.int64)
    ax = np.array([a[1] for a in anchors], dtype=np.int64)
    ay = np.array([a[2] for a in anchors], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy().astype(np.int64)
        x, y = hash_xy(keys)
        # (n_points, n_anchors) L1 distance matrix, exact ints
        d = (np.abs(x[:, None] - ax[None, :])
             + np.abs(y[:, None] - ay[None, :]))
        rows = []
        for j in range(len(anchors)):
            order = np.lexsort((keys, d[:, j]))[:k]
            rows.append(pd.DataFrame({
                "anchor_id": aid[j], "k": keys[order],
                "d_l1": d[order, j]}))
        out = pd.concat(rows, ignore_index=True)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    final = []
    for j in sorted(set(part["anchor_id"])):
        sub = part[part["anchor_id"] == j].sort_values(
            ["d_l1", "k"]).head(k).reset_index(drop=True)
        sub["rank"] = np.arange(1, len(sub) + 1)
        final.append(sub)
    out = pd.concat(final, ignore_index=True)[
        ["anchor_id", "rank", "k", "d_l1"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out
