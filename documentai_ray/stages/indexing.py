"""Distributed text indexing: inverted index (postings) and TF-IDF.

The two classic wide operations of a corpus indexer, expressed so the
shuffles stay proportional to the DISTINCT (token, doc) relation, never
the raw token stream:

- ``inverted_index``  token → (df, sorted posting list). Map side emits
  each (token, doc_id) pair ONCE per doc (per-doc set()), so the exchange
  carries the distinct relation. The reduce side is bucketed by
  ``crc32(token) % P`` — the posting lists of all tokens in a bucket are
  built in one vectorized pandas pass, so group count is bounded by P,
  not vocabulary size (the per-key ``map_groups`` anti-pattern noted in
  ``dedup._add_pkey``).
- ``tfidf_topk``      per-doc top-k terms by ``score_ppm =
  tf · 10⁶ // df`` (integer rarity-weighted term frequency — a pure
  integer-math rank that the SQL oracle reproduces bit-exactly; float
  ``log`` idf would differ across libm implementations at the ulp level
  and flip near-tie ranks). Document frequencies are computed in one
  distributed pass and broadcast via ``ray.put`` — valid while the
  vocabulary is broadcast-small (≤ ~10⁷ terms: a 100 MB dict). For
  open-vocabulary corpora swap the broadcast for a hash_join of the
  (doc, token, tf) relation against the df table on token — same
  bucketed plan as ``joins.hash_join``; the rank step is unchanged.

At 100 TB the posting lists themselves are the output bottleneck: cap
them with ``max_postings`` (keep the first N doc_ids + the true df), the
standard impact-ordered-index compromise.
"""

from __future__ import annotations

import collections

import pandas as pd
import pyarrow as pa

from documentai_ray.stages.dedup import _add_pkey


def _explode_distinct(ds, id_col: str, text_col: str):
    """One (token, id) row per DISTINCT token of each doc — single-space
    split, the corpus token contract (empties kept)."""

    def explode(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        ids: list[int] = []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            for tok in set((t or "").split(" ")):
                toks.append(tok)
                ids.append(did)
        return pa.table({"token": pa.array(toks, pa.string()),
                         id_col: pa.array(ids, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def inverted_index(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int = 64, max_postings: int | None = None):
    """Build ``(token, df, postings: list<int64>)`` — postings sorted
    ascending, ``df`` always the TRUE document frequency even when
    ``max_postings`` truncates the stored list."""

    pairs = _explode_distinct(ds, id_col, text_col)

    def build(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["token", id_col], kind="mergesort")
        grouped = g.groupby("token", sort=False)[id_col]
        tokens = list(grouped.groups.keys())
        lists = [v.to_numpy() for _, v in grouped]
        df = [len(v) for v in lists]
        if max_postings is not None:
            lists = [v[:max_postings] for v in lists]
        return pa.table({"token": pa.array(tokens, pa.string()),
                         "df": pa.array(df, pa.int64()),
                         "postings": pa.array([v.tolist() for v in lists],
                                              pa.list_(pa.int64()))})

    return (
        _add_pkey(pairs, "token", num_partitions)
        .groupby("_pkey")
        .map_groups(lambda g: build(g.drop(columns=["_pkey"])),
                    batch_format="pandas")
    )


def document_frequencies(ds, *, id_col: str = "doc_id",
                         text_col: str = "text") -> dict[str, int]:
    """Distributed df computation: distinct (token, doc) pairs →
    ``groupby(token).count()``. Materializes only the (token, df) table —
    vocabulary-sized, the broadcast-small side."""
    from ray.data.aggregate import Count

    pairs = _explode_distinct(ds, id_col, text_col)
    out = pairs.groupby("token").aggregate(Count(alias_name="df")).to_pandas()
    return dict(zip(out["token"], out["df"].astype(int)))


class TfIdfTopK:
    """Per-doc top-k terms by integer score ``tf · 10⁶ // df`` (ties →
    token ascending). The df dict ships once per worker via the object
    store ref, not per batch."""

    def __init__(self, df_ref, *, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3):
        import ray

        self.df = ray.get(df_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        ranks: list[int] = []
        toks_out: list[str] = []
        tf_out: list[int] = []
        df_out: list[int] = []
        score_out: list[int] = []
        for did, t in zip(batch.column(self.id_col).to_pylist(),
                          batch.column(self.text_col).to_pylist()):
            tf = collections.Counter((t or "").split(" "))
            scored = sorted(
                ((-(c * 1_000_000 // self.df[tok]), tok, c) for tok, c in tf.items()),
                key=lambda x: (x[0], x[1]),
            )[: self.k]
            for r, (neg, tok, c) in enumerate(scored, start=1):
                ids.append(did)
                ranks.append(r)
                toks_out.append(tok)
                tf_out.append(c)
                df_out.append(self.df[tok])
                score_out.append(-neg)
        return pa.table({self.id_col: pa.array(ids, pa.int64()),
                         "term_rank": pa.array(ranks, pa.int64()),
                         "token": pa.array(toks_out, pa.string()),
                         "tf": pa.array(tf_out, pa.int64()),
                         "df": pa.array(df_out, pa.int64()),
                         "score_ppm": pa.array(score_out, pa.int64())})


def tfidf_topk(ds, *, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3):
    """Two-pass TF-IDF: distributed df → broadcast → map-side per-doc
    top-k. See module docstring for the open-vocabulary join variant."""
    import ray

    df = document_frequencies(ds, id_col=id_col, text_col=text_col)
    ref = ray.put(df)
    return ds.map_batches(
        TfIdfTopK, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"df_ref": ref, "id_col": id_col,
                               "text_col": text_col, "k": k},
    )


def kwic_snippets(ds, *, id_cols: list[str], text_col: str,
                  keyword: str, before: int = 3, after: int = 3):
    """KWIC (keyword-in-context) concordance — the search-result
    snippet extractor: every occurrence of ``keyword`` (exact token
    match under the repo-standard whitespace rule) becomes one
    ``(id_cols..., pos, snippet)`` row, ``pos`` the 1-based token
    position and ``snippet`` the space-joined window of ``before``
    tokens left and ``after`` right (clamped at document edges).

    Pure per-batch transform, ZERO exchange: token explode reuses the
    posexplode layout (flat token array + doc index + positions, all
    vectorized); only the MATCHES pay Python-level snippet joins, so
    per-batch cost is O(tokens) scan + O(hits · window) assembly — the
    right trade for sparse keywords (for dense ones the snippet column
    itself is the output bottleneck, not the assembly)."""
    import numpy as np

    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")

    def snip(batch: pa.Table) -> pa.Table:
        toks_per = (batch.select([text_col]).to_pandas()[text_col]
                    .fillna("").str.split())
        lens = toks_per.str.len().fillna(0).astype(np.int64).to_numpy()
        total = int(lens.sum())
        ids = {c: batch.column(c).to_pylist() for c in id_cols}
        empty = pa.table(
            {**{c: pa.array([], batch.schema.field(c).type)
                for c in id_cols},
             "pos": pa.array([], pa.int64()),
             "snippet": pa.array([], pa.string())})
        if total == 0:
            return empty
        flat = np.fromiter((t for lst in toks_per for t in lst),
                           dtype=object, count=total)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        starts = np.repeat(
            np.concatenate(([0], lens.cumsum()[:-1])), lens)
        pos0 = np.arange(total, dtype=np.int64) - starts  # 0-based
        hits = np.nonzero(flat == keyword)[0]
        if len(hits) == 0:
            return empty
        out_ids = {c: [ids[c][doc_idx[h]] for h in hits]
                   for c in id_cols}
        snippets = []
        for h in hits:
            d, p = doc_idx[h], pos0[h]
            lo = starts[h] + max(0, p - before)
            hi = min(starts[h] + lens[d], h + after + 1)
            snippets.append(" ".join(flat[lo:hi]))
        return pa.table(
            {**{c: pa.array(out_ids[c], batch.schema.field(c).type)
                for c in id_cols},
             "pos": pa.array((pos0[hits] + 1).tolist(), pa.int64()),
             "snippet": pa.array(snippets, pa.string())})

    return ds.map_batches(snip, batch_format="pyarrow")


def rrf_fuse(ds, *, id_col: str, score_cols: list[str], k: int = 60,
             top_n: int = 20, out_col: str = "rrf"):
    """Reciprocal Rank Fusion — the standard way to combine rankings
    whose raw scores are incomparable (BM25 + embedding cosine, price +
    recency): each ranking contributes ``1/(k + rank)`` and the fused
    order is by the sum (Cormack et al. 2009, public knowledge). Kept
    integer-exact by flooring EACH term at 10⁹ scale —
    ``rrf = Σ 10⁹ // (k + rank_i)`` — so the SQL mirror reproduces the
    fused order bit-for-bit (a float 1/(k+r) sum can flip near-ties
    across libms). Ranks are SQL ``rank()`` min-rank-with-ties,
    DESCENDING (higher score = rank 1).

    Physical plan: one value-count histogram exchange PER ranking
    (bounded by that column's distinct values — the percent_rank
    contract), driver turns cumulative counts into min-ranks and
    broadcasts the maps via ``ray.put``; per-batch attach computes the
    fused score, and the global top-N is an aggregation (per-batch
    partial top-N, ≤ N rows per block to the driver). Ties in rrf
    break by ascending id, so the result is total. Returns an Arrow
    table (id, rank cols..., rrf) of the top N."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    if k < 1 or top_n < 1:
        raise ValueError("k and top_n must be >= 1")

    maps = []
    for col in score_cols:
        def partial(batch: pa.Table, _c=col) -> pa.Table:
            df = batch.select([_c]).to_pandas()
            g = (df.groupby(_c, as_index=False).size()
                 .rename(columns={"size": "_n", _c: "_v"}))
            return pa.Table.from_pandas(
                g, preserve_index=False).replace_schema_metadata(None)

        hist = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("_v")
                .aggregate(Sum("_n", alias_name="_n"))).to_pandas()
        hist = hist.sort_values("_v", ascending=False,
                                kind="mergesort")
        cum = hist["_n"].cumsum().to_numpy()
        start = [1] + (cum[:-1] + 1).tolist()   # min rank, desc order
        maps.append({v: int(r) for v, r in
                     zip(hist["_v"].tolist(), start)})
    maps_ref = ray.put(maps)

    rank_cols = [f"rank_{c}" for c in score_cols]

    def attach(batch: pa.Table) -> pa.Table:
        lks = ray.get(maps_ref)
        out = {id_col: batch.column(id_col)}
        rrf = None
        for col, rc, lk in zip(score_cols, rank_cols, lks):
            vals = batch.column(col).to_pylist()
            r = np.fromiter((lk[v] for v in vals), dtype=np.int64,
                            count=len(vals))
            out[rc] = pa.array(r, pa.int64())
            term = 1_000_000_000 // (k + r)
            rrf = term if rrf is None else rrf + term
        out[out_col] = pa.array(rrf, pa.int64())
        tbl = pa.table(out)
        df = tbl.to_pandas().sort_values(
            [out_col, id_col], ascending=[False, True],
            kind="mergesort").head(top_n)          # partial top-N
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values([out_col, id_col],
                            ascending=[False, True],
                            kind="mergesort").head(top_n)
    return pa.Table.from_pandas(
        cand, preserve_index=False).replace_schema_metadata(None)
