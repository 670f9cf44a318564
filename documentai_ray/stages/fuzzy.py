"""Approximate string matching: edit-distance fuzzy join.

The fuzzy key join a crawl pipeline needs when host/entity strings are
dirty (typos, truncation, OCR damage) and must be snapped to a canonical
vocabulary before keyed aggregation. Semantics: each dirty string is
matched to the canonical string with minimum Levenshtein distance
(unit-cost insert/delete/substitute — identical to DuckDB/Postgres
``levenshtein``), ties broken lexicographically; matches beyond
``max_dist`` are dropped.

Scale contract (the whole design): edit distance is quadratic per pair
and cannot shuffle, so the join runs on the DISTINCT dirty-key
projection — one bounded exchange dedupes the keys, the (small) distinct
set × (small) canonical vocabulary match happens once, and the resulting
mapping is broadcast (``ray.put``) and applied per batch as a plain
lookup. This is the standard fuzzy-join plan when the distinct key count
is worker-memory-small (typo'd host names, entity labels: bounded
vocabularies). For unbounded distinct keys, block first (length +
first-char banding, or q-gram LSH as in stages/dedup.py) — documented,
not implemented here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, vectorized row DP (numpy inner loop over
    the shorter-string rows; the insertion chain is resolved with the
    (min-accumulate of tmp[k]-k)+j prefix trick instead of a scalar
    scan)."""
    if a == b:
        return 0
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return m or n
    bz = np.array(list(b))
    prev = np.arange(n + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        sub = prev[:-1] + (bz != ca)
        tmp = np.minimum(prev[1:] + 1, sub)
        # cur[j] = min(tmp[j], cur[j-1]+1) == min_{k<=j}(vals[k]) + j,
        # vals = [i, tmp[1]-1, tmp[2]-2, ...]
        vals = np.concatenate(([i], tmp - np.arange(1, n + 1)))
        prev = np.minimum.accumulate(vals) + np.arange(n + 1)
    return int(prev[-1])


def match_vocabulary(dirty: list[str], canon: list[str],
                     *, max_dist: int) -> dict[str, tuple[str, int]]:
    """Exhaustive distinct-set match: for each dirty string the argmin-
    distance canonical (lexicographic tie-break), omitted if the best
    distance exceeds ``max_dist``."""
    canon_sorted = sorted(canon)
    out: dict[str, tuple[str, int]] = {}
    for d in dirty:
        best: tuple[int, str] | None = None
        for c in canon_sorted:
            dist = levenshtein(d, c)
            if best is None or dist < best[0]:
                best = (dist, c)
        if best is not None and best[0] <= max_dist:
            out[d] = (best[1], best[0])
    return out


def fuzzy_match_join(ds, *, col: str, canon: list[str], max_dist: int,
                     matched_col: str = "canon", dist_col: str = "dist",
                     num_partitions: int = 16):
    """Snap ``ds[col]`` to the canonical vocabulary; rows whose best match
    is farther than ``max_dist`` are dropped. Physical plan: distinct
    projection of ``col`` (one bounded key-only exchange), one driver-side
    vocabulary match over the distinct set (contract: distinct count is
    small — hosts/labels, not free text), broadcast mapping, vectorized
    per-batch lookup."""
    import ray
    import zlib

    def project(batch: pa.Table) -> pa.Table:
        vals = batch.column(col)
        pk = pa.array(
            np.fromiter((zlib.crc32(str(v).encode()) % num_partitions
                         for v in vals.to_pylist()),
                        dtype=np.int32, count=len(vals)))
        return pa.table({col: vals, "_pkey": pk})

    def distinct(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates([col])
        return pa.table({col: pa.array(df[col].astype(str), pa.string())})

    distinct_vals = [
        r[col]
        for r in ds.map_batches(project, batch_format="pyarrow")
        .groupby("_pkey").map_groups(distinct, batch_format="pyarrow")
        .take_all()
    ]
    mapping = match_vocabulary(distinct_vals, canon, max_dist=max_dist)
    map_ref = ray.put(mapping)

    def attach(batch: pa.Table) -> pa.Table:
        mp = ray.get(map_ref)
        vals = batch.column(col).to_pylist()
        hits = [mp.get(v) for v in vals]
        keep = np.array([h is not None for h in hits], dtype=bool)
        out = batch.filter(pa.array(keep))
        kept = [h for h in hits if h is not None]
        out = out.append_column(
            matched_col, pa.array([c for c, _ in kept], pa.string()))
        return out.append_column(
            dist_col, pa.array([d for _, d in kept], pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")
