"""Corpus-curation operators for LLM training-data pipelines.

Beyond the reference's own surface (it has no corpus ops — SURVEY §2.8),
these are the standard curation passes a 100 TB text pipeline runs, each
expressed Ray-Data-first and DuckDB-oracle-checkable:

- ``decontaminate``       benchmark n-gram overlap flagging (the GPT-3
  13-gram decontamination rule, Brown et al. 2020 §C): the benchmark's
  n-gram hash set broadcasts once via ``ray.put``; membership is a
  vectorized ``np.isin`` per batch. Never a join — the benchmark side is
  always broadcast-small relative to the corpus.
- ``sample_by_source``    deterministic per-source sampling (domain
  weighting): keep iff ``knuth_hash(id) / 2^32 < rate(source)``.
  Parallelism-independent and reproducible in SQL (no RNG state) — the
  same contract as the train/val/test split.
- ``repetition_stats``    Gopher-style repetition metrics (Rae et al.
  2021, Table A1): duplicate-token fraction and top-2-gram fraction per
  document, with a keep flag at configurable thresholds.
- ``redact_batch``        pattern redaction (dates / currency amounts →
  placeholder tokens): compiled-regex sub per row, mirrored by
  ``regexp_replace(..., 'g')`` in the oracle.
- ``normalize_batch``     NFC unicode normalization + ASCII-whitespace
  collapse (the CCNet/mC4 text-cleanup pass) — mirrored by DuckDB
  ``nfc_normalize`` + ``regexp_replace``.
- ``chunk_batch``         overlapping token-window chunking (RAG /
  context-window prep): map-only row explosion, integer-math chunk
  count mirrored in SQL.
- ``pack_sequences``      greedy sequential bin packing of docs into
  fixed-token-budget training sequences per shard — one bucketed
  shuffle, one ordered pass per partition; mirrored by a recursive-CTE
  oracle.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa

from documentai_ray.stages.dedup import _shingle_hashes

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def build_ngram_set(texts: list[str], n: int = 13) -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark texts (the broadcast
    side). 64-bit shingle hashes — membership tests are exact modulo
    ~2⁻⁶⁴ collisions."""
    parts = [_shingle_hashes(t or "", n) for t in texts]
    parts = [p for p in parts if p.size]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class DecontaminateStage:
    """Appends ``contaminated: bool`` — doc shares ≥1 n-gram with the
    benchmark set. The set ships once per actor/worker via the object
    store (``ray.put`` ref in the constructor args), NOT per batch."""

    def __init__(self, ngram_set_ref, n: int = 13, text_col: str = "text"):
        import ray

        self.ngrams = ray.get(ngram_set_ref)
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = []
        for t in batch.column(self.text_col).to_pylist():
            h = _shingle_hashes(t or "", self.n)
            flags.append(bool(h.size) and bool(np.isin(h, self.ngrams,
                                                       assume_unique=False).any()))
        return batch.append_column("contaminated", pa.array(flags, pa.bool_()))


def decontaminate(ds, ngram_set: np.ndarray, *, n: int = 13,
                  text_col: str = "text"):
    import ray

    ref = ray.put(ngram_set)
    return ds.map_batches(
        DecontaminateStage, batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"ngram_set_ref": ref, "n": n,
                               "text_col": text_col},
    )


# ---------------------------------------------------------------------------
# deterministic per-source sampling (domain weighting)
# ---------------------------------------------------------------------------

_KNUTH = 2654435761
_MOD32 = 1 << 32
_SAMPLE_SALT = 12345


def sample_by_source(ds, rates: dict[str, float], *, id_col: str = "doc_id",
                     source_col: str = "source", default_rate: float = 1.0):
    """Keep each row iff ``((id·K + salt) mod 2³²) / 2³² < rate[source]``.
    Deterministic, parallelism-independent, SQL-reproducible."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        frac = (((ids * np.uint64(_KNUTH)) + np.uint64(_SAMPLE_SALT))
                % np.uint64(_MOD32)).astype(np.float64) / float(_MOD32)
        rate = np.array([rates.get(s, default_rate)
                         for s in batch.column(source_col).to_pylist()])
        return batch.filter(pa.array(frac < rate))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher-style repetition metrics
# ---------------------------------------------------------------------------

def repetition_stats(text: str) -> tuple[float, float]:
    """(duplicate-token fraction, top-2-gram fraction), floor-truncated at
    1e-6 to mirror the SQL oracle's float grid. Fewer than 2 tokens → both
    0.0 (no 2-grams; a single token is trivially distinct)."""
    import math

    toks = text.split()
    if len(toks) < 2:
        return 0.0, 0.0
    dup_frac = 1.0 - len(set(toks)) / len(toks)
    counts: dict[tuple[str, str], int] = {}
    for a, b in zip(toks, toks[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    top = max(counts.values())
    top_frac = top / (len(toks) - 1)
    return (math.floor(dup_frac * 1e6) / 1e6, math.floor(top_frac * 1e6) / 1e6)


def repetition_batch(batch: pa.Table, *, text_col: str = "text",
                     max_top2_frac: float = 0.03) -> pa.Table:
    dup, top2, keep = [], [], []
    for t in batch.column(text_col).to_pylist():
        d, t2 = repetition_stats(t or "")
        dup.append(d)
        top2.append(t2)
        keep.append(t2 <= max_top2_frac)
    out = batch.append_column("dup_token_frac", pa.array(dup, pa.float64()))
    out = out.append_column("top2gram_frac", pa.array(top2, pa.float64()))
    return out.append_column("rep_keep", pa.array(keep, pa.bool_()))


# ---------------------------------------------------------------------------
# pattern redaction
# ---------------------------------------------------------------------------

# RE2-compatible patterns (no lookarounds) — the oracle mirrors them with
# regexp_replace(..., 'g'); keep the two in sync.
REDACT_PATTERNS: list[tuple[str, str]] = [
    (r"\d{2}\.\d{2}\.\d{4}", "<DATE>"),
    (r"[A-Z]{3} [\d,]+\.\d{2}", "<AMT>"),
]

_REDACT_COMPILED = [(re.compile(p), repl) for p, repl in REDACT_PATTERNS]


# ---------------------------------------------------------------------------
# unicode + whitespace normalization
# ---------------------------------------------------------------------------

# ASCII whitespace only, deliberately: RE2 (the oracle's regex engine) has
# ASCII \s while Python's str \s is unicode-aware — an explicit class keeps
# the two engines bit-identical. NFC itself is the standard both utf8proc
# (DuckDB nfc_normalize) and CPython unicodedata implement.
_NORM_WS = re.compile(r"[ \t\n\r]+")


def normalize_text(text: str) -> str:
    """NFC-normalize, collapse ASCII whitespace runs to one space, trim."""
    t = unicodedata.normalize("NFC", text)
    return _NORM_WS.sub(" ", t).strip(" ")


def normalize_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    norm = [normalize_text(t or "") for t in texts]
    out = batch.append_column("norm_text", pa.array(norm, pa.large_string()))
    out = out.append_column(
        "n_chars_raw", pa.array([len(t or "") for t in texts], pa.int64()))
    return out.append_column(
        "n_chars_norm", pa.array([len(t) for t in norm], pa.int64()))


# ---------------------------------------------------------------------------
# overlapping token-window chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

def chunk_tokens(n: int, window: int, stride: int) -> int:
    """Number of chunks for an n-token doc: 1 if it fits, else enough
    stride steps that the last window reaches the end (integer math —
    mirrored op-for-op by the SQL oracle)."""
    if n <= window:
        return 1
    return (n - window + stride - 1) // stride + 1


def chunk_batch(batch: pa.Table, *, id_col: str = "doc_id",
                text_col: str = "text", window: int = 32,
                stride: int = 24) -> pa.Table:
    """Explode docs into overlapping token-window chunks:
    ``(doc_id, chunk_id, chunk_text, chunk_tokens)``. Tokens are the
    single-space split (the corpus token contract; empties kept so the
    SQL ``string_split`` mirror is exact). Map-only — chunking never
    shuffles; downstream stages see a flat chunk table."""
    ids_out: list[int] = []
    cid_out: list[int] = []
    txt_out: list[str] = []
    ntok_out: list[int] = []
    for did, t in zip(batch.column(id_col).to_pylist(),
                      batch.column(text_col).to_pylist()):
        toks = (t or "").split(" ")
        n = len(toks)
        for k in range(chunk_tokens(n, window, stride)):
            s = k * stride
            ids_out.append(did)
            cid_out.append(k)
            txt_out.append(" ".join(toks[s:s + window]))
            ntok_out.append(min(window, n - s))
    return pa.table({id_col: pa.array(ids_out, pa.int64()),
                     "chunk_id": pa.array(cid_out, pa.int64()),
                     "chunk_text": pa.array(txt_out, pa.large_string()),
                     "chunk_tokens": pa.array(ntok_out, pa.int64())})


# ---------------------------------------------------------------------------
# greedy sequence packing (training-batch prep)
# ---------------------------------------------------------------------------

def pack_sequences(ds, *, group_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text", budget: int = 256,
                   num_partitions: int = 64):
    """Greedy sequential bin packing of docs into fixed-token-budget
    training sequences, independently per ``group_col`` (shard) in
    ``id_col`` order: a doc opens a new bin iff adding it would exceed
    ``budget``; docs longer than the budget are truncation-capped to one
    full bin (``cost = min(n_tokens, budget)``).

    Physical plan: one hash-partition shuffle on ``crc32(group) % P``
    (all docs of a shard co-locate), then ONE ordered pass per partition
    packs every shard at once — O(rows) with numpy array access, group
    count bounded by P. Deterministic and parallelism-independent because
    the scan order (group, id) is a total order. Returns
    ``(doc_id, group, n_tokens, cost, bin_id)`` with ``bin_id`` local to
    the group."""
    from documentai_ray.stages.dedup import _add_pkey

    def cost_stage(batch: pa.Table) -> pa.Table:
        ntok = [len((t or "").split(" "))
                for t in batch.column(text_col).to_pylist()]
        out = pa.table({id_col: batch.column(id_col),
                        group_col: batch.column(group_col)})
        out = out.append_column("n_tokens", pa.array(ntok, pa.int64()))
        return out.append_column(
            "cost", pa.array([min(n, budget) for n in ntok], pa.int64()))

    def pack_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, id_col], kind="mergesort")
        costs = g["cost"].to_numpy()
        groups = g[group_col].to_numpy()
        bins = np.empty(len(g), np.int64)
        cur = None
        cum = 0
        b = 0
        for i in range(len(g)):
            if groups[i] != cur:
                cur, b, cum = groups[i], 0, costs[i]
            elif cum + costs[i] > budget:
                b += 1
                cum = costs[i]
            else:
                cum += costs[i]
            bins[i] = b
        g = g.drop(columns=["_pkey"]).reset_index(drop=True)
        g["bin_id"] = bins
        return g

    prepped = ds.map_batches(cost_stage, batch_format="pyarrow")
    return (
        _add_pkey(prepped, group_col, num_partitions)
        .groupby("_pkey")
        .map_groups(pack_partition, batch_format="pandas")
    )


def redact_text(text: str) -> str:
    for rx, repl in _REDACT_COMPILED:
        text = rx.sub(repl, text)
    return text


def redact_batch(batch: pa.Table, *, text_col: str = "text",
                 out_col: str = "redacted") -> pa.Table:
    red = [redact_text(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(red, pa.large_string()))


# ---------------------------------------------------------------------------
# Gopher quality rules (the non-repetition half of Rae et al. 2021 A1)
# ---------------------------------------------------------------------------

_GQ_SYMBOLS = re.compile(r"[a-zA-Z0-9 \n]")  # removing KEEPS the symbols
_WS_SPLIT = re.compile(r"\s+")

GQ_MIN_WORDS = 50
GQ_MAX_WORDS = 100_000
GQ_MWL_MIN_PPM = 3_000_000   # mean word length in [3, 10]
GQ_MWL_MAX_PPM = 10_000_000
GQ_SYMBOL_MAX_PPM = 100_000  # symbol-to-char ratio <= 0.1
GQ_BULLET_MAX_PPM = 900_000  # <= 90% bullet lines


def gopher_quality(text: str) -> tuple[int, int, int, int, bool]:
    """(n_words, mean_word_len_ppm, symbol_ppm, bullet_ppm, keep) — all
    ratios as integer ppm (floor), so the SQL oracle is bit-exact."""
    words = [w for w in _WS_SPLIT.split(text) if w]
    n_words = len(words)
    n_chars = len(text)
    if n_words == 0:
        return 0, 0, 0, 0, False
    mwl = sum(len(w) for w in words) * 1_000_000 // n_words
    sym = len(_GQ_SYMBOLS.sub("", text))
    sym_ppm = sym * 1_000_000 // n_chars if n_chars else 0
    lines = text.split("\n")
    bull = sum(1 for l in lines if l.startswith(("-", "*")))
    bull_ppm = bull * 1_000_000 // len(lines)
    keep = (GQ_MIN_WORDS <= n_words <= GQ_MAX_WORDS
            and GQ_MWL_MIN_PPM <= mwl <= GQ_MWL_MAX_PPM
            and sym_ppm <= GQ_SYMBOL_MAX_PPM
            and bull_ppm <= GQ_BULLET_MAX_PPM)
    return n_words, mwl, sym_ppm, bull_ppm, keep


def gopher_quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    cols: dict[str, list] = {"n_words": [], "mean_word_len_ppm": [],
                             "symbol_ppm": [], "bullet_ppm": [],
                             "gq_keep": []}
    for t in batch.column(text_col).to_pylist():
        nw, mwl, sym, bull, keep = gopher_quality(t or "")
        cols["n_words"].append(nw)
        cols["mean_word_len_ppm"].append(mwl)
        cols["symbol_ppm"].append(sym)
        cols["bullet_ppm"].append(bull)
        cols["gq_keep"].append(keep)
    out = batch
    for name in ("n_words", "mean_word_len_ppm", "symbol_ppm", "bullet_ppm"):
        out = out.append_column(name, pa.array(cols[name], pa.int64()))
    return out.append_column("gq_keep", pa.array(cols["gq_keep"], pa.bool_()))


# ---------------------------------------------------------------------------
# URL filtering (crawl-frontier hygiene: blocklists + tracking variants)
# ---------------------------------------------------------------------------

def url_filter_batch(batch: pa.Table, *, blocked_hosts: frozenset,
                     url_col: str = "url") -> pa.Table:
    """Per-URL keep/drop decision for a crawl frontier — the UT1-blocklist
    style pass every web pipeline runs before fetch/extract. Rules in
    priority order (first hit wins):

    1. host ∈ ``blocked_hosts``        → drop, reason ``blocked_host``
    2. URL carries a query string      → drop, reason ``query_string``
       (tracking/AMP variants; canonical dedup handles the survivors)
    3. otherwise                       → keep, reason ``ok``

    The blocklist broadcasts as a plain frozenset inside the UDF closure
    (set size ≪ data; at 100 TB ship it via ``ray.put`` once and resolve
    in a stage constructor — same shape as DecontaminateStage).
    Appends ``host``, ``keep:bool``, ``drop_reason:string``.
    """
    urls = batch.column(url_col).to_pylist()
    hosts, keeps, reasons = [], [], []
    for u in urls:
        host = u.split("/", 3)[2] if u.count("/") >= 2 else ""
        hosts.append(host)
        if host in blocked_hosts:
            keeps.append(False)
            reasons.append("blocked_host")
        elif "?" in u:
            keeps.append(False)
            reasons.append("query_string")
        else:
            keeps.append(True)
            reasons.append("ok")
    return (batch.append_column("host", pa.array(hosts, pa.string()))
            .append_column("keep", pa.array(keeps, pa.bool_()))
            .append_column("drop_reason", pa.array(reasons, pa.string())))


# ---------------------------------------------------------------------------
# deterministic training-shard export order
# ---------------------------------------------------------------------------

_KNUTH = 2654435761
_M32 = 1 << 32


def recrawl_priority(ds, *, url_col: str = "url", ts_col: str = "ts",
                     hash_col: str = "content_hash",
                     num_partitions: int = 64, hot_ppm: int = 500_000):
    """Freshness-driven recrawl scheduling (Cho & Garcia-Molina 2003's
    change-rate estimator, integer-ppm form): per URL, the fraction of
    capture intervals whose content hash CHANGED decides how soon the
    crawler should revisit.

    Emits ``(url, n_captures, n_changes, change_ppm, recrawl_bucket)``
    where ``change_ppm = n_changes·10⁶ // (n_captures−1)`` (0 for
    single-capture urls) and the bucket is ``hot`` (≥ hot_ppm), ``cold``
    (no observed change), else ``warm``.

    Physical plan: ONE ``crc32(url) % P`` exchange co-locates each url's
    capture history, then a single vectorized pass per partition handles
    every url at once — sort by (url, ts); change mask =
    ``hash != shift(hash)`` masked at url boundaries; two grouped
    reductions. Group count is bounded by P, not by url cardinality
    (same contract as windows.session_windows)."""
    from documentai_ray.stages.dedup import _add_pkey

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([url_col, ts_col], kind="mergesort")
        same_url = g[url_col].eq(g[url_col].shift())
        changed = same_url & g[hash_col].ne(g[hash_col].shift())
        agg = pd.DataFrame({url_col: g[url_col], "chg": changed})
        out = agg.groupby(url_col, sort=False).agg(
            n_captures=("chg", "size"), n_changes=("chg", "sum")
        ).reset_index()
        n, c = (out["n_captures"].to_numpy(np.int64),
                out["n_changes"].to_numpy(np.int64))
        ppm = np.where(n > 1, c * 10 ** 6 // np.maximum(n - 1, 1), 0)
        out["n_captures"] = n
        out["n_changes"] = c
        out["change_ppm"] = ppm
        out["recrawl_bucket"] = np.where(
            ppm >= hot_ppm, "hot", np.where(c > 0, "warm", "cold"))
        return out

    return (_add_pkey(ds, url_col, num_partitions)
            .groupby("_pkey")
            .map_groups(lambda g: per_partition(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))


def sitemap_expand(ds, sitemap_bodies: dict, *, host_col: str = "host",
                   xml_col: str = "xml", max_depth: int = 4):
    """Flat-map each host's entry sitemap into (host, url, lastmod) rows,
    following ``<sitemapindex>`` references breadth-first up to
    ``max_depth`` levels (cycle-safe: each loc visits once per host).

    ``sitemap_bodies`` maps child sitemap URL → raw XML and broadcasts
    via ``ray.put`` — in a live crawler the resolution step is a fetch;
    here the bodies table stands in for the fetch cache. The expansion is
    per-host-row independent, so it parallelizes as an ordinary
    ``map_batches`` with no exchange."""
    import ray

    from documentai_ray.functions.sitemap import parse_sitemap

    ref = ray.put(sitemap_bodies)

    def expand(batch: pa.Table) -> pa.Table:
        bodies = ray.get(ref)
        hosts_out, urls_out, mods_out = [], [], []
        for host, xml in zip(batch.column(host_col).to_pylist(),
                             batch.column(xml_col).to_pylist()):
            seen: set[str] = set()
            frontier = [(xml, 0)]
            while frontier:
                body, depth = frontier.pop()
                kind, items = parse_sitemap(body)
                if kind == "index":
                    if depth >= max_depth:
                        continue
                    for loc in items:
                        if loc not in seen and loc in bodies:
                            seen.add(loc)
                            frontier.append((bodies[loc], depth + 1))
                else:
                    for loc, lastmod in items:
                        hosts_out.append(host)
                        urls_out.append(loc)
                        mods_out.append(lastmod)
        return pa.table({"host": pa.array(hosts_out, pa.string()),
                         "url": pa.array(urls_out, pa.string()),
                         "lastmod": pa.array(mods_out, pa.string())})

    return ds.map_batches(expand, batch_format="pyarrow")


def robots_txt_gate(ds, robots_by_host: dict, *, url_col: str = "url",
                    agent: str = "*", keep_only: bool = False):
    """Host-side crawl compliance: evaluate every page URL against its
    host's robots.txt policy (functions/robots.py, RFC 9309 longest-match
    semantics) and append ``host`` + ``allowed:bool`` — or drop blocked
    rows when ``keep_only``.

    ``robots_by_host`` maps host → raw robots.txt text (hosts with no
    entry allow everything). Policies are compiled ONCE on the driver and
    the compiled dict broadcasts via ``ray.put`` — robots files are
    KB-sized and hosts ≪ pages, the classic small-side lookup. At a
    full-crawl host count (10⁸), switch the lookup to a bucketed
    hash_join on ``host``; the per-row decision below is unchanged.

    Vectorization: rows group by host per batch; an all-plain-prefix
    policy (the overwhelmingly common real-world shape) is applied as a
    sequence of vectorized ``str.startswith`` masks in ascending
    pattern-length order (later/longer assignments override — exactly
    the longest-match rule, allow-wins on ties by apply order); only
    wildcard policies fall back to the per-row matcher.
    """
    import ray

    from documentai_ray.functions.robots import parse_robots_txt

    policies = {h: parse_robots_txt(t, agent)
                for h, t in robots_by_host.items()}
    ref = ray.put(policies)

    def gate(batch: pa.Table) -> pa.Table:
        pols = ray.get(ref)
        urls = batch.column(url_col).to_pylist()
        parts = [u.split("/", 3) for u in urls]
        hosts = np.array([p[2] if len(p) > 2 else "" for p in parts])
        paths = pd.Series(["/" + p[3] if len(p) > 3 else "/" for p in parts])
        allowed = np.ones(len(urls), bool)
        for host in pd.unique(hosts):
            pol = pols.get(host)
            if pol is None or not pol.rules:
                continue
            sel = hosts == host
            sub = paths[sel]
            if pol.all_plain_prefix:
                dec = np.ones(len(sub), bool)
                for r in reversed(pol.rules):     # ascending length,
                    m = sub.str.startswith(r.pattern).to_numpy()
                    dec[m] = r.allow              # longer rules override
            else:
                dec = np.fromiter((pol.allowed(p) for p in sub), bool,
                                  count=len(sub))
            allowed[sel] = dec
        host_arr = pa.array(hosts, pa.string())
        if "host" in batch.column_names:      # overwrite, never duplicate
            batch = batch.set_column(batch.column_names.index("host"),
                                     "host", host_arr)
        else:
            batch = batch.append_column("host", host_arr)
        out = batch.append_column("allowed", pa.array(allowed, pa.bool_()))
        return out.filter(pa.array(allowed)) if keep_only else out

    return ds.map_batches(gate, batch_format="pyarrow")


def assign_shards(ds, *, n_shards: int = 16, id_col: str = "doc_id"):
    """Deterministic global shuffle + shard assignment for training-data
    export: shard = knuth_hash(id) % n_shards, position within the shard =
    rank of (hash, id). The hash order IS the shuffle — reproducible,
    parallelism-independent, and resumable per shard (each shard is an
    independent output partition; a failed export rewrites only its shard).

    Physical plan: map-side hash/shard columns, ONE bucketed exchange on
    ``shard`` (group count = n_shards, bounded), one vectorized argsort per
    shard partition. At 10¹² rows pick n_shards ≈ corpus_bytes / 1 GB and
    sub-sort per shard via the same hash — never a global sort.
    Returns ``(id, shard, h, pos)``.
    """

    def key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), np.uint64)
        h = (ids * _KNUTH) % _M32
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "shard": pa.array((h % n_shards).astype(np.int64), pa.int64()),
            "h": pa.array(h.astype(np.int64), pa.int64())})

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="mergesort").reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(order, batch_format="pandas"))


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (hashed-ngram importance resampling)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 64


def _token_bucket(tok: str, n_buckets: int, _cache: dict = {}) -> int:
    """Repo-standard md5-LE64 token hash → bucket, memoized per worker
    (natural-language token sets are tiny relative to token counts)."""
    b = _cache.get(tok)
    if b is None:
        from documentai_ray.stages.sketches import md5_le64
        b = md5_le64(tok) % n_buckets
        _cache[tok] = b
    return b


def dsir_bucket_counts(ds, *, text_col: str = "text",
                       n_buckets: int = DSIR_BUCKETS,
                       doc_filter=None):
    """One streaming pass → length-``n_buckets`` token-count vector (the
    hashed unigram feature counts of Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"). Each batch emits its
    partial bincount (≤ n_buckets rows); the exchange is bucket-count
    sized, never token sized. ``doc_filter(batch) -> bool mask`` restricts
    to a target subset (e.g. the benchmark docs). Returns np.int64[B]."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        if doc_filter is not None:
            mask = doc_filter(batch)
            texts = [t for t, m in zip(texts, mask) if m]
        counts = np.zeros(n_buckets, np.int64)
        for t in texts:
            for tok in (t or "").split():
                counts[_token_bucket(tok, n_buckets)] += 1
        return pa.table({"bucket": pa.array(range(n_buckets), pa.int64()),
                         "cnt": pa.array(counts, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
           .to_pandas())
    out = np.zeros(n_buckets, np.int64)
    out[agg["bucket"].to_numpy()] = agg["cnt"].to_numpy()
    return out


def dsir_score(ds, target_counts: np.ndarray, raw_counts: np.ndarray, *,
               id_col: str = "doc_id", text_col: str = "text",
               n_buckets: int = DSIR_BUCKETS):
    """Per-document importance score: Σ_tokens score_ppm[bucket(token)]
    where score_ppm[b] = ((target[b]+1)·10⁶) // (raw[b]+1) — the
    Laplace-smoothed integer RATIO analog of DSIR's log-likelihood ratio
    (monotone in the ratio per bucket; integer so the SQL oracle is
    bit-exact — float logs would drift). The two count vectors are
    broadcast-small (B ints) and ship in the UDF closure. Returns
    ``(id, dsir_score_ppm)`` with 0 for token-less docs."""
    score = ((np.asarray(target_counts, np.int64) + 1) * 1_000_000
             // (np.asarray(raw_counts, np.int64) + 1))

    def sc(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        vals = []
        for t in batch.column(text_col).to_pylist():
            s = 0
            for tok in (t or "").split():
                s += int(score[_token_bucket(tok, n_buckets)])
            vals.append(s)
        return pa.table({id_col: ids,
                         "dsir_score_ppm": pa.array(vals, pa.int64())})

    return ds.map_batches(sc, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# data-mixing planner (source-weighted token budgeting with epoch repeats)
# ---------------------------------------------------------------------------

def mix_plan(ds, weights: dict[str, int], *, budget_factor: int = 2,
             source_col: str = "source", text_col: str = "text"):
    """Training-mix plan (the Pile / DoReMi static-mix pattern): given
    integer source weights and a token budget of ``budget_factor ×``
    the corpus total, compute per source how many full epochs to repeat
    it and the sampling rate that trims the final epoch to hit the
    target exactly — all integer math (ppm rates), so the SQL oracle is
    bit-exact.

        target_s = budget · w_s // Σw
        epochs_s = ceil(target_s / actual_s)
        rate_ppm = target_s · 10⁶ // (epochs_s · actual_s)

    One combiner pass (per-batch token counts per source — the exchange
    is bounded by the source cardinality), one tiny groupby, plan math on
    the driver. Returns one row per source present in the corpus:
    ``(source, actual_tokens, target_tokens, n_epochs, rate_ppm)``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s, t in zip(batch.column(source_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            counts[s] = counts.get(s, 0) + len((t or "").split())
        return pa.table({source_col: pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(source_col).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    total = int(agg["n"].sum())
    budget = budget_factor * total
    wsum = sum(weights[s] for s in agg[source_col])
    rows = []
    for s, actual in zip(agg[source_col], agg["n"]):
        actual = int(actual)
        target = budget * weights[s] // wsum
        if actual == 0:
            rows.append((s, 0, target, 0, 0))
            continue
        epochs = -(-target // actual)
        rate = target * 1_000_000 // (epochs * actual) if epochs else 0
        rows.append((s, actual, target, epochs, rate))
    rows.sort()
    return pa.table({
        source_col: pa.array([r[0] for r in rows], pa.string()),
        "actual_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "target_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "n_epochs": pa.array([r[3] for r in rows], pa.int64()),
        "rate_ppm": pa.array([r[4] for r in rows], pa.int64())})


def pseudonymize(ds, cols: list, *, salt: str, out_suffix: str = "_pseudo"):
    """GDPR-style pseudonymization for exported datasets: replace
    identifier columns with a KEYED hash (md5-LE64 of ``salt:value``) —
    stable within an export (joins/groupbys still work) but unlinkable
    to the raw id without the salt, which stays out of the output. The
    deterministic complement of ``redact_text`` (free-text patterns):
    this handles the STRUCTURED identifiers. Drops the original
    columns."""
    from documentai_ray.stages.sketches import md5_le64

    def apply(batch: pa.Table) -> pa.Table:
        for c in cols:
            vals = batch.column(c).to_pylist()
            hs = np.fromiter((md5_le64(f"{salt}:{v}") for v in vals),
                             np.uint64, count=len(vals)).astype(np.int64)
            batch = batch.append_column(c + out_suffix,
                                        pa.array(hs, pa.int64()))
        return batch.drop_columns(cols)

    return ds.map_batches(apply, batch_format="pyarrow")


def sorted_range_export(ds, out_dir: str, *, key_col: str,
                        boundaries: list):
    """Range-partitioned SORTED export — the CDX/index shard layout:
    shard i holds exactly the keys in [b_{i-1}, b_i) for EXPLICIT,
    driver-chosen boundaries (pick them from a quantile sketch of the
    key column at scale), each shard written key-sorted, so every key in
    shard i precedes every key in shard i+1 and a binary search over the
    manifest finds any key's shard. Explicit boundaries — not Ray's
    data-dependent sort splits — make the layout REPRODUCIBLE at any
    parallelism (a resumable/diffable index build needs that).

    One bounded exchange on the shard id; per shard: vectorized sort +
    atomic parquet publish. Returns the manifest Dataset
    ``(shard, n_rows, min_key, max_key)``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    bnd = list(boundaries)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        shard = np.searchsorted(np.array(bnd, dtype=object), keys,
                                side="right")
        return batch.append_column("_shard",
                                   pa.array(shard.astype("int64"), pa.int64()))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = int(g["_shard"].iloc[0])
        g = g.drop(columns=["_shard"]).sort_values(key_col, kind="mergesort")
        path = os.path.join(out_dir, f"part-{s:04d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [s], "n_rows": [len(g)],
                             "min_key": [g[key_col].iloc[0]],
                             "max_key": [g[key_col].iloc[-1]]})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pandas"))


def waterfill_allocate(ds, *, key_col: str, demand_col: str,
                       budget_num: int = 3, budget_den: int = 5):
    """Max-min fair (water-filling) budget allocation — the crawl
    scheduler's fairness primitive: given per-key demand (fetches a
    host wants, samples a source requests), split a global budget so
    that no key can gain without a smaller-allocation key losing.
    Progressive filling: demands sorted ascending; a key whose demand
    fits under the current fair share is fully satisfied, the rest
    split what remains evenly — ``base = rem // m`` each, the first
    ``rem % m`` of them (in (demand, key) order, so the rule is total
    and deterministic) getting +1. Budget is expressed as the exact
    fraction ``budget_num/budget_den`` of TOTAL demand so the op is
    scale-free and the SQL mirror needs no out-of-band constant.

    Exact integer arithmetic end to end: key k (1-based in sorted
    order) is satisfied iff ``prefix_{k−1} + d_k·(n−k+1) ≤ B`` — the
    classic closed form, floor-safe because everything is a product or
    prefix sum.

    Physical plan: per-batch (key, demand) sum partials → ONE exchange
    bounded by distinct keys → driver sort + fill over the key-bounded
    table (the same read-off-the-tiny-aggregate shape as the histogram
    quantile ops). Returns (key, demand, alloc, satisfied)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, demand_col]).to_pandas()
        g = (df.groupby(key_col, as_index=False)[demand_col].sum()
             .rename(columns={demand_col: "_d"}))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    dem = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key_col).aggregate(Sum("_d", alias_name="_d"))
           ).to_pandas()
    if len(dem) and int(dem["_d"].min()) < 0:
        raise ValueError("waterfill_allocate requires non-negative "
                         "demand")
    dem = dem.sort_values([ "_d", key_col],
                          kind="mergesort").reset_index(drop=True)
    total = int(dem["_d"].sum())
    budget = total * budget_num // budget_den
    n = len(dem)
    alloc = np.zeros(n, dtype=np.int64)
    rem, m = budget, n
    for i in range(n):
        d = int(dem["_d"].iloc[i])
        if d * m <= rem:           # fully satisfied under fair share
            alloc[i] = d
            rem -= d
            m -= 1
        else:                       # water level reached: split evenly
            base, extra = rem // m, rem % m
            alloc[i:] = base
            alloc[i:i + extra] += 1
            break
    out = pd.DataFrame({key_col: dem[key_col],
                        "demand": dem["_d"].astype("int64"),
                        "alloc": alloc,
                        "satisfied": alloc == dem["_d"].to_numpy()})
    return pa.Table.from_pandas(out, preserve_index=False) \
                   .replace_schema_metadata(None)
