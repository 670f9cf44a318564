"""Cochran's Q marginal homogeneity and process-log conformance."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestCochranQ:
    def test_smoke_corpus_closed_form(self, ray_session):
        """Only ambiguous POs defect and both defectors defect
        together, so Q collapses: num = 12b², den = 4b, Q = 3b —
        and significance is literally 'are there ≥ 3 ambiguous
        pages'."""
        import __ray_entry__ as entrymod
        from documentai_ray.sources import pages
        from tests.conftest import SF_SMOKE

        docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                             columns=["doc_id"]).to_pandas()
        n = len(docs)
        b = sum(1 for d in docs["doc_id"]
                if pages.is_ambiguous_po(int(d))
                and not pages.is_malformed(int(d)))
        out = entrymod._q_cochran_q(SF_SMOKE).iloc[0]
        assert out["n_pages"] == n
        assert (out["c_keyword"], out["c_ml"]) == (n, n)
        assert (out["c_regex"], out["c_tokenset"]) == (n - b, n - b)
        assert out["q_milli"] == 3000 * b
        assert bool(out["significant"]) == (b >= 3)

    def test_general_formula_hand(self):
        """Hand fold of the general Q on a 3-page, k=4 census where
        only one technique misses one page: C = (3,3,3,2), X =
        (4,4,3): num = 3·(4·31 − 121) = 9, den = 44 − 41 = 3,
        Q = 3.000 — matches the textbook Q for a single defect."""
        cs = [3, 3, 3, 2]
        sxx = 16 + 16 + 9
        s = sum(cs)
        num = 3 * (4 * sum(c * c for c in cs) - s * s)
        den = 4 * s - sxx
        assert (num, den) == (9, 3)
        assert 1000 * num // den == 3000


class TestConformance:
    def test_hand_log(self, ray_session, tmp_path):
        """signup→view→click→purchase is fully on-model; the
        error detour (view→error→view) contributes the 2 violating
        transitions of 6 → conformance 4/6 = 666666 ppm."""
        ts = pd.Timestamp("2024-01-01")
        seq1 = ["signup", "view", "click", "purchase"]
        seq2 = ["signup", "view", "error", "view"]
        rows = []
        eid = 0
        for uid, seq in ((1, seq1), (2, seq2)):
            for i, t in enumerate(seq):
                rows.append((eid, uid, ts + pd.Timedelta(minutes=i),
                             t, 0.0))
                eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                         "event_type", "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_conformance_check(str(tmp_path))
        assert int(out["n"].sum()) == 6
        bad = out[~out["allowed"]]
        assert sorted(zip(bad["prev_type"], bad["next_type"])) == [
            ("error", "view"), ("view", "error")]
        assert (out["conformance_ppm"] == 1_000_000 * 4 // 6).all()

    def test_corpus_has_violations(self, ray_session):
        """The synthetic corpus's error events guarantee nonzero
        violation mass — conformance strictly between 0 and 1e6."""
        import __ray_entry__ as entrymod
        from tests.conftest import SF_SMOKE

        out = entrymod._q_conformance_check(SF_SMOKE)
        ppm = int(out["conformance_ppm"].iloc[0])
        assert 0 < ppm < 1_000_000
        assert (~out["allowed"]).any()
