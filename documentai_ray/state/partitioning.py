"""Explicit url-hash partitioning with salted keys for skew-heavy hosts.

North-rule requirement: partitioning / shuffle / skew handled explicitly.
The reference's only answer to skew is hard caps (50 MB / 200 pages —
SURVEY §4); at crawl scale one host can own 30-50 % of rows (the synthetic
corpus deliberately gives ``heavy.example.com`` ~33 %).

Design:

- The *partition key* is the url's host — co-locating a host's pages is the
  useful locality unit — EXCEPT for detected heavy hosts, whose key is
  salted ``host#<crc32(url) % k>`` so one host spreads over ``k`` buckets.
- The *bucket* is ``crc32(partition_key) % n_buckets`` — content-addressed,
  independent of task count / parallelism, so a resume at different
  parallelism still matches completed buckets (SURVEY §7.5 risk 7).
- Heavy hosts are detected with a cheap partial-aggregation pre-pass
  (per-batch host counts → tiny ``groupby(host).sum``), never a full
  shuffle of the payload.

Granularity note: the number of NON-EMPTY buckets is bounded by the number
of distinct partition keys (hosts + heavy-host salt splits). On a real
crawl (millions of hosts) every bucket fills; on a synthetic corpus with
few hosts, size ``n_buckets``/``salt_k`` accordingly or partition keys
degenerate to the host count (observed: 20 hosts + 8 salts → 22 of 64
buckets used — correct, but resume granularity follows the key count).
"""

from __future__ import annotations

import zlib
from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def host_of(url: str) -> str:
    return urlsplit(url).netloc


def crc32_str(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def partition_key(url: str, heavy_hosts: dict[str, int]) -> str:
    host = host_of(url)
    k = heavy_hosts.get(host)
    if not k:
        return host
    return f"{host}#{crc32_str(url) % k}"


def bucket_of(url: str, n_buckets: int, heavy_hosts: dict[str, int]) -> int:
    return crc32_str(partition_key(url, heavy_hosts)) % n_buckets


def add_bucket_column(ds, n_buckets: int, heavy_hosts: dict[str, int]):
    """Append ``bucket:int32`` from the url column (stateless map_batches)."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        buckets = np.fromiter(
            (bucket_of(u, n_buckets, heavy_hosts) for u in urls),
            dtype=np.int32, count=len(urls),
        )
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    return ds.map_batches(f, batch_format="pyarrow")


def detect_heavy_hosts(ds, *, share_threshold: float = 0.10, salt_k: int = 8) -> dict[str, int]:
    """Pre-pass heavy-hitter detection via partial aggregation.

    Per-batch host value_counts (tiny per-batch output: one row per distinct
    host per batch) → small ``groupby(host).sum`` → hosts above
    ``share_threshold`` of total rows get salt factor ``salt_k``.
    Only (host, n) pairs are shuffled — never payloads.
    """

    def partial(batch: pa.Table) -> pa.Table:
        hosts = [host_of(u) for u in batch.column("url").to_pylist()]
        vc = pd.Series(hosts).value_counts()
        return pa.table(
            {"host": pa.array(vc.index.tolist(), pa.string()),
             "n": pa.array(vc.values, pa.int64())}
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.select_columns(["url"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="n"))
        # pin: the (host, n) table is consumed twice (total + heavy
        # filter) and is bounded by distinct-host cardinality — without
        # the pin each consumer re-runs the url pass over the corpus
        .materialize()
    )
    total = counts.sum("n") or 0
    if total == 0:
        return {}
    cutoff = share_threshold * total

    def only_heavy(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n"), cutoff))

    # only hosts above the cutoff reach the driver — at crawl scale the
    # distinct-host table has millions of rows, the heavy set a handful
    heavy = counts.map_batches(only_heavy, batch_format="pyarrow").to_pandas()
    return {h: salt_k for h in heavy["host"].tolist()}


def rendezvous_assign(ds, *, key_col: str, shards: list[str],
                      out_col: str = "shard"):
    """Rendezvous (highest-random-weight) shard assignment — the
    sticky-routing primitive behind consistent cache/shard placement
    (Thaler & Ravishankar 1996, public knowledge): each key goes to
    ``argmax over shards of hash(key, shard)``. The property mod-N
    hashing lacks: when a shard is ADDED only ~1/(K+1) of keys move
    (exactly the keys whose new-shard hash wins), and when one is
    REMOVED only its own keys move — everything else stays put, so a
    resize never triggers a full re-shuffle of 100 TB of routed state.

    Hash is the repo-standard md5-LE64 of ``"{key}|{shard}"``; argmax
    ties (astronomically unlikely, but the rule must be total) break
    toward the lexically larger shard name so the rule is deterministic
    and SQL-mirrorable. Pure per-batch map over K hash columns — ZERO
    exchange; K is the shard count, not data."""
    import numpy as np
    import pyarrow as pa

    from documentai_ray.stages.sketches import md5_le64

    if not shards:
        raise ValueError("rendezvous_assign needs at least one shard")
    ordered = sorted(shards)  # later (larger) name wins ties via >=

    def assign(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch.column(key_col).to_pylist()]
        best = np.zeros(len(keys), dtype=object)
        best_h = None
        for sh in ordered:
            h = np.fromiter((md5_le64(f"{k}|{sh}") for k in keys),
                            dtype=np.uint64, count=len(keys))
            if best_h is None:
                best_h, best[:] = h, sh
            else:
                win = h >= best_h
                best_h = np.where(win, h, best_h)
                best[win] = sh
        return batch.append_column(
            out_col, pa.array([str(s) for s in best], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def coordinated_sample(ds, *, key_col: str, accept_hex: str = "012"):
    """Coordinated (consistent / congruent) sampling: keep a row iff
    the FIRST hex digit of ``md5(str(key))`` is in ``accept_hex`` — a
    deterministic, data-independent rule, so two tables sampled with
    the SAME rule on the SAME join key preserve referential integrity:
    sample(A) ⋈ sample(B) == sample(A ⋈ B). That identity is what makes
    a 1-10 % dev slice of a 100 TB warehouse usable — independent
    per-table samples of a parent/child pair keep ~p² of the joinable
    pairs (and break FK completeness entirely); a coordinated sample
    keeps exactly the p share, with every kept parent's children intact.

    ``accept_hex``: subset of '0123456789abcdef'; each digit admits
    1/16 of the key space (3 digits ≈ 18.75 %). Pure per-row filter,
    ZERO exchange, parallelism-independent; md5-of-decimal-string keeps
    the SQL mirror one substr() away."""
    import hashlib

    if not accept_hex or any(c not in "0123456789abcdef"
                             for c in accept_hex):
        raise ValueError("accept_hex must be non-empty hex digits")
    accept = frozenset(accept_hex)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        mask = pa.array(
            [hashlib.md5(str(k).encode()).hexdigest()[0] in accept
             for k in keys], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
