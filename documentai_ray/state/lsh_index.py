"""Online MinHash-LSH near-dup index — the SHARED MUTABLE INDEX case
where raw Ray actors are the right tool (a Dataset op can't hold state
that later batches must read): index a corpus once, then answer
"is this new document a near-dup of anything indexed?" for arriving
batches without re-running the batch LSH join.

Sharding: band keys hash-route to ``num_shards`` actors, each owning a
disjoint slice of the bucket space — adds and queries touch only the
shards their keys land on, so both scale horizontally and no actor holds
the whole index. Band-key construction is IDENTICAL to the batch path
(stages/dedup.py::lsh_candidate_pairs: md5 of band-index + signature
chunk), so a corpus indexed here and queried there agrees with the batch
candidate set; shingle-less (all-max-signature) rows are skipped on both
the add and query sides per the same ADVICE-r1 contract.

Candidates are LSH candidates, not verified pairs — callers re-rank with
exact Jaccard (``verify_with_texts`` below mirrors the batch verifier's
broadcast path) exactly like the batch pipeline does.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

from documentai_ray.stages.dedup import MinHashStage, ngram_jaccard

_ALLMAX = np.iinfo(np.uint64).max


def _band_keys(sig, bands: int, rows_per_band: int):
    """Band keys for one signature — byte-compatible with the batch
    explode in lsh_candidate_pairs."""
    keys = []
    for b in range(bands):
        chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
        keys.append(hashlib.md5(
            (str(b) + ":" + ",".join(map(str, chunk))).encode()
        ).hexdigest()[:16])
    return keys


@ray.remote
class LSHIndexShard:
    """One bucket-space shard of the index. State: band_key → [doc ids].
    Methods are batched (one RPC per batch per shard, never per row)."""

    def __init__(self):
        self.buckets: dict = {}

    def add(self, keys: list, ids: list) -> int:
        for k, i in zip(keys, ids):
            self.buckets.setdefault(k, []).append(i)
        return len(keys)

    def query(self, keys: list, qids: list) -> list:
        out = []
        for k, q in zip(keys, qids):
            for iid in self.buckets.get(k, ()):
                out.append((q, iid))
        return out

    def stats(self) -> dict:
        return {"n_buckets": len(self.buckets),
                "n_postings": sum(len(v) for v in self.buckets.values())}

    def dump(self) -> tuple:
        keys, ids = [], []
        for k in sorted(self.buckets):
            for i in self.buckets[k]:
                keys.append(k)
                ids.append(i)
        return keys, ids


def _shard_of(key: str, num_shards: int) -> int:
    return int(key[:8], 16) % num_shards


def build_lsh_index(ds, *, id_col: str = "url", num_shards: int = 4,
                    num_perm: int = 64, bands: int = 16):
    """Index every row's band keys into the actor shards. Consumes the
    Dataset batch-by-batch on the driver loop (adds must serialize into
    the mutable state; the per-shard RPC is batched). Returns the shard
    handles."""
    rows_per_band = num_perm // bands
    shards = [LSHIndexShard.remote() for _ in range(num_shards)]
    sigged = ds.map_batches(MinHashStage, batch_format="pyarrow",
                            concurrency=(1, 4),
                            fn_constructor_kwargs={"num_perm": num_perm})
    for batch in sigged.iter_batches(batch_format="pyarrow"):
        per_shard_keys = [[] for _ in range(num_shards)]
        per_shard_ids = [[] for _ in range(num_shards)]
        for i, sig in zip(batch.column(id_col).to_pylist(),
                          batch.column("minhash").to_pylist()):
            if sig and sig[0] == _ALLMAX:
                continue
            for k in _band_keys(sig, bands, rows_per_band):
                s = _shard_of(k, num_shards)
                per_shard_keys[s].append(k)
                per_shard_ids[s].append(i)
        ray.get([shards[s].add.remote(per_shard_keys[s], per_shard_ids[s])
                 for s in range(num_shards) if per_shard_keys[s]])
    return shards


def query_lsh_index(ds, shards, *, id_col: str = "url",
                    num_perm: int = 64, bands: int = 16):
    """Probe the index for every row of ``ds``: → Dataset of DISTINCT
    candidate ``(query_id, match_id)`` rows. The probe itself runs as a
    ``map_batches`` stage — each task hits only the shards its keys
    route to."""
    rows_per_band = num_perm // bands
    handles = list(shards)

    def probe(batch: pa.Table) -> pa.Table:
        per_shard_keys = [[] for _ in handles]
        per_shard_ids = [[] for _ in handles]
        for i, sig in zip(batch.column(id_col).to_pylist(),
                          batch.column("minhash").to_pylist()):
            if sig and sig[0] == _ALLMAX:
                continue
            for k in _band_keys(sig, bands, rows_per_band):
                s = _shard_of(k, len(handles))
                per_shard_keys[s].append(k)
                per_shard_ids[s].append(i)
        found = ray.get([handles[s].query.remote(per_shard_keys[s],
                                                 per_shard_ids[s])
                         for s in range(len(handles)) if per_shard_keys[s]])
        pairs = sorted({p for chunk in found for p in chunk})
        return pa.table({
            "query_id": pa.array([p[0] for p in pairs], pa.string()),
            "match_id": pa.array([p[1] for p in pairs], pa.string()),
        })

    sigged = ds.map_batches(MinHashStage, batch_format="pyarrow",
                            concurrency=(1, 4),
                            fn_constructor_kwargs={"num_perm": num_perm})
    return sigged.map_batches(probe, batch_format="pyarrow")


def verify_with_texts(cands_ds, query_texts: dict, index_texts: dict, *,
                      threshold: float = 0.8, k: int = 3):
    """Exact-Jaccard re-rank of index candidates (broadcast path — both
    text maps ship once via ``ray.put``; use the batch verifier's
    hash-join plan when the maps outgrow the broadcast budget)."""
    qref = ray.put(query_texts)
    iref = ray.put(index_texts)

    def keep(batch: pa.Table) -> pa.Table:
        qt = ray.get(qref)
        it = ray.get(iref)
        mask = [ngram_jaccard(qt.get(q, ""), it.get(m, ""), k) >= threshold
                for q, m in zip(batch.column("query_id").to_pylist(),
                                batch.column("match_id").to_pylist())]
        return batch.filter(pa.array(mask))

    return cands_ds.map_batches(keep, batch_format="pyarrow")


def save_lsh_index(shards, out_dir: str) -> list:
    """Persist the index: each shard dumps its postings to
    ``shard-<i>.parquet`` (atomic publish). Shard i's file MUST reload
    into actor i — the band-key → shard routing is positional."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    dumps = ray.get([s.dump.remote() for s in shards])
    paths = []
    for i, (keys, ids) in enumerate(dumps):
        path = os.path.join(out_dir, f"shard-{i:02d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table({"band_key": pa.array(keys, pa.string()),
                                 "doc_id": pa.array(ids, pa.string())}), tmp)
        os.replace(tmp, path)
        paths.append(path)
    return paths


def load_lsh_index(out_dir: str):
    """Rebuild the shard actors from a saved index directory (positional
    shard files preserve the routing)."""
    import glob
    import os

    import pyarrow.parquet as pq

    paths = sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    shards = [LSHIndexShard.remote() for _ in paths]
    ray.get([
        shards[i].add.remote(t.column("band_key").to_pylist(),
                             t.column("doc_id").to_pylist())
        for i, t in ((i, pq.read_table(p)) for i, p in enumerate(paths))
    ])
    return shards
