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
"""

from __future__ import annotations

import re

import numpy as np
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


def redact_text(text: str) -> str:
    for rx, repl in _REDACT_COMPILED:
        text = rx.sub(repl, text)
    return text


def redact_batch(batch: pa.Table, *, text_col: str = "text",
                 out_col: str = "redacted") -> pa.Table:
    red = [redact_text(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(red, pa.large_string()))
