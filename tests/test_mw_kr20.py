"""Mann-Whitney U test and KR-20 reliability."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _lineitem(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["l_quantity", "l_returnflag"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))


class TestMannWhitney:
    def test_perfect_separation_small_n(self, ray_session, tmp_path):
        """pos = {3,4}, neg = {1,2}: doubled ranks 2/4/6/8, doubled
        U' = 14 − 6 = 8 (U = n₁n₂ = 4, perfect), D = 4, var12 = 20
        exactly: z² = 3·16/20 = 2.4 → 2400 milli — but 4 rows can't
        clear chi²₁ (48e6 < 3841459·20), not significant."""
        _lineitem(tmp_path, [(3.0, "R"), (4.0, "R"),
                             (1.0, "N"), (2.0, "N")])
        import __ray_entry__ as entrymod

        out = entrymod._q_mann_whitney(str(tmp_path)).iloc[0]
        assert (out["n_pos"], out["n_neg"]) == (2, 2)
        assert out["u2"] == 8
        assert out["t3"] == 0
        assert out["var12"] == 20
        assert out["z2_milli"] == 2400
        assert not out["significant"]

    def test_all_tied_guard(self, ray_session, tmp_path):
        """Every quantity identical: T₃ = n³−n wipes the variance,
        var12 = 0 → z² = 0, not significant (no crash)."""
        _lineitem(tmp_path, [(5.0, "R"), (5.0, "R"),
                             (5.0, "N"), (5.0, "N")])
        import __ray_entry__ as entrymod

        out = entrymod._q_mann_whitney(str(tmp_path)).iloc[0]
        assert out["var12"] == 0
        assert out["u2"] == 2 * 2  # U' = n1·n2 → D = 0
        assert (out["z2_milli"], bool(out["significant"])) == (0, False)

    def test_separation_at_scale_significant(self, ray_session,
                                             tmp_path):
        """30 pos at qty 10 vs 30 neg at qty 1: D = n₁n₂ (maximal),
        z² = 3·n₁n₂·n(n−1)/(…) clears the 5% bar easily."""
        _lineitem(tmp_path, [(10.0, "R")] * 30 + [(1.0, "N")] * 30)
        import __ray_entry__ as entrymod

        out = entrymod._q_mann_whitney(str(tmp_path)).iloc[0]
        assert out["significant"]
        assert out["z2_milli"] > 3841


class TestKr20:
    def test_smoke_corpus_constant_alpha(self, ray_session):
        """The planted corpus's two defectors (regex, tokenset)
        defect on exactly the same pages, so KR-20 is closed-form
        2/3 at EVERY scale: S = 2b(n−b), V = 4b(n−b), alpha 666."""
        import __ray_entry__ as entrymod
        from documentai_ray.sources import pages
        from tests.conftest import SF_SMOKE

        docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                             columns=["doc_id"]).to_pandas()
        n = len(docs)
        b = sum(1 for d in docs["doc_id"]
                if pages.is_ambiguous_po(int(d))
                and not pages.is_malformed(int(d)))
        out = entrymod._q_kr20_reliability(SF_SMOKE).iloc[0]
        assert out["n_pages"] == n
        assert out["sum_pq_n2"] == 2 * b * (n - b)
        assert out["var_n2"] == 4 * b * (n - b)
        assert out["alpha_milli"] == 666
