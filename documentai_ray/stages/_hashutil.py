"""Vectorized partition-key hashing shared by the exchange-adjacent
stages (VERDICT r3 #6).

``hash_pkey`` maps one or more key columns to ``hash(row) % P`` via
polars' 64-bit row hash — a single vectorized pass instead of the
per-row ``zlib.crc32(str(...))`` Python loops it replaces. Any
deterministic, process-stable hash is valid here: partitioners only
need same-key → same-partition (across every worker of a run), and no
output ever depends on WHICH partition a group lands in. Callers must
pass columns ALREADY cast to the dtype shared by both sides of a join
(polars hashes int32 and int64 representations of the same value
differently).

The crc32 fallback covers dtypes polars cannot hash; it preserves the
old behavior (string-repr of the ``|``-joined tuple).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hash_pkey(columns, num_partitions: int) -> np.ndarray:
    """``columns``: list of pa.Array / pa.ChunkedArray / python lists,
    all the same length. Returns int32 ndarray of partition ids."""
    cols = [c if isinstance(c, (pa.Array, pa.ChunkedArray))
            else pa.array(c) for c in columns]
    try:
        import polars as pl

        df = pl.DataFrame({f"c{i}": pl.from_arrow(c)
                           for i, c in enumerate(cols)})
        return ((df.hash_rows(seed=0) % num_partitions)
                .cast(pl.Int32).to_numpy())
    except Exception:  # pragma: no cover - non-polars-hashable dtype
        import zlib

        pys = [c.to_pylist() for c in cols]
        n = len(pys[0])
        return np.fromiter(
            (zlib.crc32("|".join(str(v) for v in row).encode())
             % num_partitions for row in zip(*pys)),
            dtype=np.int32, count=n)
