"""Dyadic-RBO ranking-stability audit."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts_by_id):
    pq.write_table(pa.table({
        "doc_id": list(texts_by_id),
        "text": [texts_by_id[k] for k in texts_by_id]}),
        os.path.join(tmp_path, "documents.parquet"))


def test_rank_overlap_identical_halves_residue(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # doc 1 → half A, doc 3 → half B (Knuth coins F/F → wait: both
    # land per the hash); craft ids so each half holds one identical
    # doc: uid 1 → ctrl half, uid 2 → treat half (same text).
    _write_docs(tmp_path, {1: "a b c", 2: "a b c"})
    out = entrymod._q_rank_overlap(str(tmp_path)).iloc[0]
    # 4 tokens per list ('a b c' splits to a,b,c — 3 tokens), ranked
    # identically → overlap@d = min(d, 3); rbo = Σ 1e6·min(d,3)//(d·2^d)
    expect = sum(1_000_000 * min(d, 3) // (d * (1 << d))
                 for d in range(1, 21))
    assert out["rbo_ppm"] == expect
    assert out["jaccard20_ppm"] == 1_000_000
    assert out["overlap_at_5"] == 3
    # identical lists cap at the truncation residue, never 1e6
    assert out["rbo_ppm"] < 1_000_000


def test_rank_overlap_disjoint_halves_zero(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    _write_docs(tmp_path, {1: "x y z", 2: "p q r"})
    out = entrymod._q_rank_overlap(str(tmp_path)).iloc[0]
    assert out["rbo_ppm"] == 0
    assert out["jaccard20_ppm"] == 0
    assert out["overlap_at_20"] == 0
