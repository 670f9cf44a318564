"""Mergeable cardinality sketches: KMV (k-minimum-values) distinct count.

The classic distributed distinct-count problem — "how many distinct
3-gram shingles does the corpus contain?" — needs a full shuffle if
answered exactly (``unique`` over 10¹² values). The KMV sketch
(Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-Value Synopses")
answers it with a BOUNDED, mergeable state: keep the k smallest distinct
hash values; if fewer than k exist the count is exact, otherwise
``(k-1) · 2⁶⁴ / h_k`` estimates the cardinality with relative error
≈ 1/√(k-2).

Why it oracles bit-exactly (unlike HyperLogLog implementations that
differ in bias-correction tables): the hash is the repo's standard
md5-LE64, the merge is "union then k smallest" (order-free), and the
estimator is pure integer math — DuckDB reproduces the identical
estimate in HUGEINT arithmetic.

Physical plan: each batch emits its k smallest DISTINCT shingle hashes
(≤ k rows/batch, a few KB); the driver merges the partials — the only
data that ever leaves a worker is sketch-sized. At 10¹² docs add one
intermediate combine ``map_batches`` if the partial stream itself gets
wide; the merge is associative so any tree shape works.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

U64 = 1 << 64


def md5_le64(s: str) -> int:
    """The repo-standard u64 string hash (md5, first 8 bytes, LE)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _shingles(text: str, k: int = 3):
    toks = [t for t in text.split() if t]
    for i in range(len(toks) - k + 1):
        yield " ".join(toks[i:i + k])


def kmv_estimate(hashes: np.ndarray, k: int) -> tuple[int, int]:
    """(n_kept, estimate) from distinct sorted u64 hashes. Exact below k."""
    hashes = np.unique(hashes)
    if len(hashes) < k:
        return len(hashes), int(len(hashes))
    hk = int(hashes[k - 1])
    return k, (k - 1) * U64 // hk


def kmv_distinct_shingles(ds, *, text_col: str = "text", k: int = 128,
                          shingle: int = 3):
    """Corpus-wide distinct 3-shingle estimate. Returns a one-row table
    ``(k, n_kept, est_distinct)``."""

    def partial(batch: pa.Table) -> pa.Table:
        hs: set[int] = set()
        for t in batch.column(text_col).to_pylist():
            for sh in _shingles(t or "", shingle):
                hs.add(md5_le64(sh))
        arr = np.fromiter(hs, np.uint64, count=len(hs))
        if len(arr) > k:
            arr = np.partition(arr, k)[:k]
        return pa.table({"h": pa.array(np.sort(arr), pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = parts["h"].to_numpy().astype(np.uint64)
    n_kept, est = kmv_estimate(merged, k)
    return pa.table({"k": pa.array([k], pa.int64()),
                     "n_kept": pa.array([n_kept], pa.int64()),
                     "est_distinct": pa.array([est], pa.int64())})
