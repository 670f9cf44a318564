"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The LLM-training-data operator the curation surface was missing: learn a
subword merge table from the corpus and encode documents with it. The
Sennrich formulation trains on the *word-frequency table*, not the raw
corpus — so the only corpus-scale pass here is the word-count aggregation
(per-batch Counter combiner → one ``groupby("word").sum`` shuffle whose
row count is bounded by the number of DISTINCT words, not documents). The
merge loop then runs over that compact table on the driver, with an
explicit size contract (``max_vocab_rows``) and a ``min_freq`` pruning
knob — at web scale the heavy-tail cut (`min_freq≥2`) is standard practice
and keeps the table in the tens of millions of rows (a few GB) even for
100 TB of text.

Semantics pinned for the SQL oracles (`__ray_entry__`):

- words are single-space splits of ``text`` (empty pieces ignored), the
  same convention as ``top_tokens``;
- the initial segmentation of a word is its characters (no end-of-word
  marker — merges act within words only);
- one merge step replaces every LEFT-TO-RIGHT NON-OVERLAPPING adjacent
  occurrence of the pair in every word (``aaa`` + merge ``(a,a)`` →
  ``[aa, a]``) — exactly what a string ``replace`` over a
  sentinel-delimited symbol string does, which is how the oracle
  expresses it;
- pair counts at each round count every adjacent occurrence (``aaa`` has
  two ``(a,a)`` pairs), weighted by word frequency;
- merge selection tie-breaks deterministically: count desc, then
  (lhs, rhs) ascending.

Encoding applies the learned merges IN TRAINING ORDER, one left-to-right
pass each. For a self-consistent merge list (each merge's symbols are
producible only by earlier merges — always true of a list this trainer
emitted) this is equivalent to rank-based iterative merging, and it is
the form a static SQL oracle can mirror as nested ``replace`` calls.

Not present in the reference (SatwickDev/DocumentAI has no tokenizer
training); this belongs to the beyond-reference LLM-pipeline surface
alongside stages/curation.py.
"""

from __future__ import annotations

import collections

import pyarrow as pa

# Fixed "pretrained" merge table used by the `bpe_encode` query: a static
# tokenizer applied to any corpus (the common production shape — train
# once, encode everywhere). Chained on purpose: later merges consume the
# outputs of earlier ones, exercising ordered application.
PRETRAINED_MERGES: list[tuple[str, str]] = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("r", "o"), ("ro", "w"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("e", "r"), ("i", "n"), ("o", "r"),
]


def word_freq_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch combiner: Counter over single-space word splits. Shuffle
    carries one (word, n) row per distinct word per batch."""
    c: collections.Counter = collections.Counter()
    for t in batch.column(text_col).to_pylist():
        for w in (t or "").split(" "):
            if w:
                c[w] += 1
    return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                     "n": pa.array(list(c.values()), pa.int64())})


def word_freqs(ds, text_col: str = "text"):
    """Corpus → (word, n) Dataset. The one corpus-scale pass of training."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(lambda b: word_freq_partial(b, text_col),
                       batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def merge_syms(syms: tuple[str, ...], lhs: str, rhs: str) -> tuple[str, ...]:
    """One left-to-right non-overlapping merge pass over a symbol tuple."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def pair_counts(vocab_syms: dict[str, tuple[str, ...]],
                vocab: dict[str, int]) -> collections.Counter:
    """Adjacent-pair counts (every occurrence, overlaps included), weighted
    by word frequency."""
    pc: collections.Counter = collections.Counter()
    for w, syms in vocab_syms.items():
        n = vocab[w]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def bpe_train(vocab: dict[str, int],
              num_merges: int) -> list[tuple[str, str, int]]:
    """Merge loop over a compact word→freq table (driver-side by design:
    the table is the OUTPUT of the distributed aggregation, orders of
    magnitude smaller than the corpus). Returns (lhs, rhs, count) per
    merge, count being the pair frequency at selection time."""
    vocab_syms = {w: tuple(w) for w in vocab}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pc = pair_counts(vocab_syms, vocab)
        if not pc:
            break
        (lhs, rhs), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((lhs, rhs, cnt))
        vocab_syms = {w: merge_syms(s, lhs, rhs)
                      for w, s in vocab_syms.items()}
    return merges


def bpe_train_distributed(ds, text_col: str = "text", num_merges: int = 10,
                          min_freq: int = 1,
                          max_vocab_rows: int = 5_000_000):
    """Distributed word-count pass + driver merge loop. ``min_freq`` prunes
    the singleton tail BEFORE the driver pull; ``max_vocab_rows`` is the
    hard size contract (raise → the caller must prune harder, the same
    explicit-contract style as dedup.py's broadcast thresholds)."""
    wf = word_freqs(ds, text_col)
    if min_freq > 1:
        wf = wf.filter(expr=f"n >= {min_freq}")
    tbl = wf.to_pandas()
    if len(tbl) > max_vocab_rows:
        raise ValueError(
            f"distinct-word table has {len(tbl)} rows > max_vocab_rows="
            f"{max_vocab_rows}; raise min_freq to prune the tail")
    vocab = dict(zip(tbl["word"], tbl["n"].astype(int)))
    return bpe_train(vocab, num_merges)


def encode_word(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    """Apply merges in training order, one pass each (see module docstring
    for why this equals rank-based merging on self-consistent lists)."""
    syms = tuple(word)
    for lhs, rhs in merges:
        if len(syms) < 2:
            break
        syms = merge_syms(syms, lhs, rhs)
    return syms


class BpeEncodeStage:
    """map_batches callable: per-doc BPE token count (and optional encoded
    stream) under a fixed merge table. Per-CALL distinct-word cache — each
    unique word in a batch is encoded once (the corpus's Zipfian word
    distribution makes this the dominant saving)."""

    def __init__(self, merges: list[tuple[str, str]] | None = None,
                 text_col: str = "text", emit_tokens: bool = False):
        self.merges = [(l, r) for l, r, *_ in (merges or PRETRAINED_MERGES)]
        self.text_col = text_col
        self.emit_tokens = emit_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache: dict[str, tuple[str, ...]] = {}
        counts: list[int] = []
        streams: list[str] = []
        for t in batch.column(self.text_col).to_pylist():
            total = 0
            parts: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                syms = cache.get(w)
                if syms is None:
                    syms = encode_word(w, self.merges)
                    cache[w] = syms
                total += len(syms)
                if self.emit_tokens:
                    parts.extend(syms)
            counts.append(total)
            if self.emit_tokens:
                streams.append(" ".join(parts))
        out = batch.append_column("n_bpe_tokens",
                                  pa.array(counts, pa.int64()))
        if self.emit_tokens:
            out = out.append_column("bpe_tokens",
                                    pa.array(streams, pa.string()))
        return out
