"""Rank-biased precision and expected reciprocal rank evals."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def test_rbp_err_two_relevant_ranking(ray_session, tmp_path):
    """q_rare = [dup, merge]: d0/d1 both contain both terms and are
    the only scored docs → ranks 1-2, both relevant (symmetric, so
    the pin is rank-order-proof): rbp = 500000+250000, err =
    500000 + 1e6//(2·4).  q_cust's ranking is nonempty ('dup'
    matches) but nothing has all three terms → 0; q_exec has no
    scored docs at all → the LEFT-JOIN zero row."""
    import __ray_entry__ as entrymod

    pq.write_table(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["dup merge", "dup merge", "nothing here"]}),
        os.path.join(tmp_path, "documents.parquet"))
    rbp = entrymod._q_rbp_eval(str(tmp_path)).set_index("query_id")
    err = entrymod._q_err_eval(str(tmp_path)).set_index("query_id")
    assert rbp.loc["q_rare", "n_rel_topk"] == 2
    assert rbp.loc["q_rare", "rbp_ppm"] == 750_000
    assert err.loc["q_rare", "err_ppm"] == 625_000
    assert rbp.loc["q_cust", "rbp_ppm"] == 0
    assert err.loc["q_cust", "err_ppm"] == 0
    assert rbp.loc["q_exec", "n_rel_topk"] == 0
    assert err.loc["q_exec", "err_ppm"] == 0


def test_fold_arithmetic_pins(ray_session, tmp_path, monkeypatch):
    """Pin the per-term integer folds on a fixed rank/rel profile
    (scaffold stubbed): relevant at ranks 1 and 3 with a miss at 2 —
    RBP's static weight ignores the gap (500000 + 125000) while
    ERR's cascade halves rank 3's credit for the rank-1 hit
    (500000 + 1e6 // (3·4) = 583333); the all-relevant list pins the
    documented 968750 / 688541 totals."""
    import sys

    import __ray_entry__ as entrymod

    profiles = {
        "gap": {"q": [(1, 1), (2, 0), (3, 1)]},
        "full": {"q": [(r, 1) for r in range(1, 6)]},
    }
    # patch the helper in the module where the query fns RESOLVE it (the
    # queries live in documentai_ray/queries/ since the monolith split)
    for name, per_q in profiles.items():
        for fn in (entrymod._q_rbp_eval, entrymod._q_err_eval):
            monkeypatch.setattr(sys.modules[fn.__module__], "_bm25_top_rel",
                                lambda sf, _p=per_q: _p)
        rbp = entrymod._q_rbp_eval("unused").set_index("query_id")
        err = entrymod._q_err_eval("unused").set_index("query_id")
        if name == "gap":
            assert rbp.loc["q", "rbp_ppm"] == 625_000
            assert err.loc["q", "err_ppm"] == 583_333
        else:
            assert rbp.loc["q", "rbp_ppm"] == 968_750
            assert err.loc["q", "err_ppm"] == 688_541
