"""Line-level corpus operators (C4 / CCNet style).

Large-scale web-text curation treats the LINE, not the document, as the
dedup unit: boilerplate (nav bars, cookie banners, legal footers) repeats
across millions of pages while the informative body is unique. The two
standard passes are

- ``dedup_lines``       corpus-level exact line dedup — keep only the FIRST
  occurrence of every distinct line across the whole corpus (first in a
  deterministic total order), then reconstruct each document from its
  surviving lines. This is the "removed duplicated lines" pass of C4
  (Raffel et al. 2020 §2.2) and the paragraph-hash dedup of CCNet
  (Wenzek et al. 2020 §3.1).
- ``c4_line_filter_batch``  per-line heuristic cleanup (C4 §2.2): drop
  lines with too few words, lines containing ``{`` (code/boilerplate),
  and header-ish lines ending in ``:``. Purely map-side.

Physical plan of ``dedup_lines`` (the part that must survive 100 TB):

1. EXPLODE (map-only): each doc emits one ``(lhash: u64, lkey: i64)`` pair
   per line, where ``lhash = md5-LE64(line)`` and
   ``lkey = doc_id << idx_bits | line_idx`` — 16 bytes/line, never the
   line text.
2. WINNERS (shuffle 1): ``groupby(lhash).min(lkey)``. Because ``lkey``
   packs ``(doc_id, line_idx)`` order-preservingly, the int64 ``min`` IS
   the lexicographic first occurrence. The exchange carries exactly the
   16-byte projection; Ray's sort-based aggregate pre-combines per block,
   so repeated boilerplate lines collapse before they cross the wire.
3. REBUILD (shuffle 2): decode winners to ``(doc_id, line_idx)``, bucket
   BOTH winners and the original docs by ``crc32(doc_id) % P`` (the
   hash_join plan, inlined so the per-doc index list never materializes as
   a pandas list column), and in one vectorized pass per partition slice
   each doc's surviving lines back into a text. Docs whose every line was
   seen earlier vanish (inner-join semantics) — mirrored by the oracle's
   GROUP BY over kept lines.

Hash collisions (md5-64) conflate two distinct lines with probability
~n²/2⁶⁵ — at 10¹² lines that is ~0.03 expected false merges corpus-wide,
the standard accepted risk of hash-based dedup (C4 uses exact 3-sentence
spans; CCNet uses the first 64 bits of SHA-1, same contract).

Reference behavioral anchor: the reference has no corpus-level ops
(SURVEY §2.8) — these extend the engine for LLM-training pipelines.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from documentai_ray.stages.dedup import _add_pkey

# doc_id << IDX_BITS | line_idx must fit int64: doc_id < 2^43, lines/doc < 2^20.
DEFAULT_IDX_BITS = 20


def line_hash64(line: str) -> int:
    """First 8 bytes (little-endian) of md5 — the same u64 contract as the
    token/fingerprint hashes elsewhere in the repo."""
    return int.from_bytes(hashlib.md5(line.encode("utf-8")).digest()[:8], "little")


def dedup_lines(ds, *, id_col: str = "doc_id", url_col: str = "url",
                text_col: str = "text", num_partitions: int = 64,
                idx_bits: int = DEFAULT_IDX_BITS):
    """Corpus-level exact line dedup; returns
    ``(url, text_dedup, n_kept, n_total)`` per doc with ≥1 surviving line.

    First occurrence = minimal ``(doc_id, line_idx)``; duplicate lines
    WITHIN a doc therefore also collapse to their first index. ``id_col``
    must be an int64 total order over docs (< 2^(63-idx_bits)).

    ``num_partitions`` sizes the rebuild buckets — see ``_add_pkey``'s
    docstring for the 256-node sizing rule; the winner shuffle is a plain
    Ray ``groupby`` and scales with the cluster on its own.
    """
    from ray.data.aggregate import Min

    mask = (1 << idx_bits) - 1

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hashes: list[int] = []
        keys: list[int] = []
        for i, t in zip(ids, texts):
            for j, line in enumerate((t or "").split("\n")):
                hashes.append(line_hash64(line))
                keys.append((i << idx_bits) | j)
        return pa.table({"lhash": pa.array(hashes, pa.uint64()),
                         "lkey": pa.array(keys, pa.int64())})

    winners = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("lhash")
        .aggregate(Min("lkey", alias_name="lkey"))
    )

    # union-by-schema of winners (decoded) and docs, tagged by _idx >= 0
    def decode(batch: pa.Table) -> pa.Table:
        k = batch.column("lkey").to_numpy().astype(np.int64)
        n = len(k)
        return pa.table({
            id_col: pa.array(k >> idx_bits, pa.int64()),
            "_idx": pa.array(k & mask, pa.int64()),
            url_col: pa.array([None] * n, pa.string()),
            text_col: pa.array([None] * n, pa.large_string()),
        })

    def pad_docs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "_idx": pa.array(np.full(n, -1), pa.int64()),
            url_col: batch.column(url_col).cast(pa.string()),
            text_col: batch.column(text_col).cast(pa.large_string()),
        })

    tagged = winners.map_batches(decode, batch_format="pyarrow").union(
        ds.map_batches(pad_docs, batch_format="pyarrow")
    )

    def rebuild(g: pd.DataFrame) -> pa.Table:
        kept = g[g["_idx"] >= 0]
        docs = g[g["_idx"] < 0]
        idx_by_doc = {
            did: np.sort(v.to_numpy())
            for did, v in kept.groupby(id_col, sort=False)["_idx"]
        }
        urls: list[str] = []
        outs: list[str] = []
        nk: list[int] = []
        nt: list[int] = []
        for did, url, text in zip(docs[id_col].to_numpy(),
                                  docs[url_col], docs[text_col]):
            ix = idx_by_doc.get(did)
            if ix is None:
                continue  # every line was a duplicate of an earlier doc's
            lines = (text or "").split("\n")
            urls.append(url)
            outs.append("\n".join(lines[i] for i in ix))
            nk.append(len(ix))
            nt.append(len(lines))
        return pa.table({url_col: pa.array(urls, pa.string()),
                         "text_dedup": pa.array(outs, pa.large_string()),
                         "n_kept": pa.array(nk, pa.int64()),
                         "n_total": pa.array(nt, pa.int64())})

    return (
        _add_pkey(tagged, id_col, num_partitions)
        .groupby("_pkey")
        .map_groups(lambda g: rebuild(g.drop(columns=["_pkey"])),
                    batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# C4-style per-line heuristic filter (map-only)
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 5

_WS = re.compile(r"\s+")


def _line_ok(line: str, min_words: int) -> bool:
    if "{" in line or line.endswith(":"):
        return False
    return len([w for w in _WS.split(line) if w]) >= min_words


def c4_filter_text(text: str, *, min_words: int = C4_MIN_WORDS) -> tuple[str, int, int]:
    """(clean_text, n_lines_kept, n_lines) for one document."""
    lines = text.split("\n")
    kept = [l for l in lines if _line_ok(l, min_words)]
    return "\n".join(kept), len(kept), len(lines)


def c4_line_filter_batch(batch: pa.Table, *, text_col: str = "text",
                         min_words: int = C4_MIN_WORDS) -> pa.Table:
    clean: list[str] = []
    nk: list[int] = []
    nt: list[int] = []
    for t in batch.column(text_col).to_pylist():
        c, k, n = c4_filter_text(t or "", min_words=min_words)
        clean.append(c)
        nk.append(k)
        nt.append(n)
    out = batch.append_column("clean_text", pa.array(clean, pa.large_string()))
    out = out.append_column("n_lines_kept", pa.array(nk, pa.int64()))
    return out.append_column("n_lines", pa.array(nt, pa.int64()))


# ---------------------------------------------------------------------------
# host-template (boilerplate chrome) removal — RefinedWeb / CCNet style
# ---------------------------------------------------------------------------

def strip_host_templates(ds, *, min_pages: int = 5, share_num: int = 1,
                         share_den: int = 4, url_col: str = "url",
                         text_col: str = "text",
                         broadcast_cap: int = 1_000_000,
                         num_partitions: int = 16):
    """Per-HOST template-line removal: a line occurring on at least
    ``share_num/share_den`` of a host's non-empty pages (host must have
    ≥ ``min_pages`` such pages) is template chrome — nav labels, legal
    footers, per-site headers that survive main-content extraction — and
    is stripped from EVERY page of that host (RefinedWeb §"line-wise
    corrections"; CCNet strips per-shard repeated paragraphs the same
    way). The share test is integer-exact: ``share_den·n ≥ share_num·hp``
    (no float threshold to drift vs an oracle).

    Returns ``(url, text_clean, n_kept, n_total)`` for every non-empty
    input page with ≥ 1 surviving line.

    Physical plan:
      1. The ``(url, text)`` projection is pinned ONCE (three consumers —
         page counts, pair counts, strip — would each re-run the upstream
         lineage otherwise; NOTES.md lazy-lineage lesson).
      2. Host page counts and distinct ``(host, lhash)`` page counts each
         shuffle 16-byte projections with per-batch combiners — line TEXT
         never crosses an exchange.
      3. The two small tables hash_join on ``host`` (both are bounded by
         host/boilerplate cardinality, not corpus rows) → template set.
      4. Strip: if the template set fits (≤ ``broadcast_cap`` rows) it
         ships once via ``ray.put`` and the strip is map-only (zero page
         shuffle). Otherwise templates aggregate to per-host hash LISTS
         and pages bucket-join them on host — one page exchange, which on
         a host-partitioned crawl layout (the standard at 100 TB) is a
         local no-op.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    def _i64(h: int) -> int:
        # signed-int64 reinterpretation of the u64 line hash: Ray's
        # multi-key groupby pickles uint64 columns into object-extension
        # arrays (breaking the downstream pandas join); int64 sorts native
        return h - (1 << 64) if h >= (1 << 63) else h

    proj = ds.select_columns([url_col, text_col]).materialize()

    def page_counts(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        cnt: dict[str, int] = {}
        for u, t in zip(urls, texts):
            if t:
                h = u.split("/")[2]
                cnt[h] = cnt.get(h, 0) + 1
        return pa.table({"host": pa.array(list(cnt), pa.string()),
                         "hp": pa.array(list(cnt.values()), pa.int64())})

    host_pages = (proj.map_batches(page_counts, batch_format="pyarrow")
                  .groupby("host").aggregate(Sum("hp", alias_name="hp")))

    def pair_counts(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        cnt: dict[tuple[str, int], int] = {}
        for u, t in zip(urls, texts):
            if not t:
                continue
            h = u.split("/")[2]
            for lh in {_i64(line_hash64(l)) for l in t.split("\n")}:
                k = (h, lh)
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table({
            "host": pa.array([k[0] for k in cnt], pa.string()),
            "lhash": pa.array([k[1] for k in cnt], pa.int64()),
            "n": pa.array(list(cnt.values()), pa.int64()),
        })

    pairs = (proj.map_batches(pair_counts, batch_format="pyarrow")
             .groupby(["host", "lhash"]).aggregate(Sum("n", alias_name="n")))

    joined = hash_join(pairs, host_pages, on="host",
                       num_partitions=num_partitions)

    def is_template(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        hp = batch.column("hp").to_numpy()
        keep = (hp >= min_pages) & (share_den * n >= share_num * hp)
        return batch.filter(pa.array(keep)).select(["host", "lhash"])

    templates = joined.map_batches(
        is_template, batch_format="pyarrow").materialize()

    def strip_with(lookup: dict) -> "pa.Table":
        def f(batch: pa.Table) -> pa.Table:
            urls = batch.column(url_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            out_u, out_t, out_k, out_n = [], [], [], []
            for u, t in zip(urls, texts):
                if not t:
                    continue
                h = u.split("/")[2]
                tset = lookup.get(h)
                lines = t.split("\n")
                kept = (lines if not tset else
                        [l for l in lines
                         if _i64(line_hash64(l)) not in tset])
                if kept:
                    out_u.append(u)
                    out_t.append("\n".join(kept))
                    out_k.append(len(kept))
                    out_n.append(len(lines))
            return pa.table({
                url_col: pa.array(out_u, pa.string()),
                "text_clean": pa.array(out_t, pa.large_string()),
                "n_kept": pa.array(out_k, pa.int64()),
                "n_total": pa.array(out_n, pa.int64()),
            })
        return f

    n_templates = templates.count()
    if n_templates <= broadcast_cap:
        lookup: dict[str, set] = {}
        for row in templates.iter_rows():
            lookup.setdefault(row["host"], set()).add(row["lhash"])
        ref = ray.put(lookup)

        def strip_bcast(batch: pa.Table) -> pa.Table:
            return strip_with(ray.get(ref))(batch)

        return proj.map_batches(strip_bcast, batch_format="pyarrow")

    # large template set: per-host hash lists bucket-join onto pages.
    # Lists build per hash-PARTITION (all hosts of a bucket in one
    # vectorized groupby-agg pass), never one map_groups call per host
    # key — group count is bounded by P, not host cardinality.
    from documentai_ray.stages.dedup import _add_pkey

    def to_lists(g: pd.DataFrame) -> pa.Table:
        agg = (g.groupby("host", sort=False)["lhash"]
               .agg(lambda s: s.astype("int64").tolist()))
        return pa.table({
            "host": pa.array(agg.index.tolist(), pa.string()),
            "tset": pa.array(agg.tolist(), pa.list_(pa.int64())),
        })

    host_sets = (_add_pkey(templates, "host", num_partitions)
                 .groupby("_pkey")
                 .map_groups(to_lists, batch_format="pandas"))

    def add_host(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        return batch.append_column(
            "host", pa.array([u.split("/")[2] for u in urls], pa.string()))

    paged = proj.map_batches(add_host, batch_format="pyarrow")
    joined_pages = hash_join(paged, host_sets, on="host", how="left",
                             num_partitions=num_partitions)

    def strip_joined(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        tsets = batch.column("tset").to_pylist()
        out_u, out_t, out_k, out_n = [], [], [], []
        for u, t, ts in zip(urls, texts, tsets):
            if not t:
                continue
            tset = set(ts) if ts else None
            lines = t.split("\n")
            kept = (lines if not tset else
                    [l for l in lines if _i64(line_hash64(l)) not in tset])
            if kept:
                out_u.append(u)
                out_t.append("\n".join(kept))
                out_k.append(len(kept))
                out_n.append(len(lines))
        return pa.table({
            url_col: pa.array(out_u, pa.string()),
            "text_clean": pa.array(out_t, pa.large_string()),
            "n_kept": pa.array(out_k, pa.int64()),
            "n_total": pa.array(out_n, pa.int64()),
        })

    return joined_pages.map_batches(strip_joined, batch_format="pyarrow")
