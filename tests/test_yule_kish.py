"""Yule's Q effect size and Kish effective sample size."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestYuleQ:
    def test_hand_cells_and_bounds(self, ray_session, tmp_path):
        """X: a=2,b=1,c=1,d=2 -> (4-1)/(4+1) = 600000. Y: perfect
        positive -> 1e6. Z: perfect negative -> -1e6. W: single cell
        -> ad+bc = 0 -> guarded 0."""
        import __ray_entry__ as entrymod

        def doc(src, lang, long):
            return (src, lang, 400 if long else 100)

        rows = ([doc("X", "en", True)] * 2 + [doc("X", "en", False)]
                + [doc("X", "zh", True)] + [doc("X", "zh", False)] * 2
                + [doc("Y", "en", True)] * 3
                + [doc("Y", "zh", False)] * 3
                + [doc("Z", "en", False)] * 3
                + [doc("Z", "zh", True)] * 3
                + [doc("W", "en", True)])
        df = pd.DataFrame(rows, columns=["source", "lang", "n_chars"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = (entrymod._q_yule_q(str(tmp_path)).set_index("source"))
        assert out.loc["X"].tolist() == [2, 1, 1, 2, 600_000]
        assert out.loc["Y", "q_ppm"] == 1_000_000
        assert out.loc["Z", "q_ppm"] == -1_000_000
        assert out.loc["W", "q_ppm"] == 0


class TestKishNeff:
    def _write(self, tmp_path, docs):
        df = pd.DataFrame(docs, columns=["doc_id", "source", "lang"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))

    def test_equal_weights_full_efficiency(self, ray_session,
                                           tmp_path):
        """One (source, lang) cell: every sampled doc gets the same
        weight, so n_eff == n_samp exactly and deff == 1.000."""
        import __ray_entry__ as entrymod

        self._write(tmp_path, [(k, "A", "en") for k in range(10)])
        out = entrymod._q_kish_neff(str(tmp_path)).iloc[0]
        assert out["n_samp"] == 5       # coins of ids 0..9
        assert out["n_eff_milli"] == 5_000
        assert out["deff_milli"] == 1_000

    def test_unequal_weights_lose_efficiency(self, ray_session,
                                             tmp_path):
        """Two sources sampled 3/5 and 2/5: weights 1666666 vs
        2500000 -> n_eff 4.799 < 5 and deff 1.041 > 1 (hand fold
        through both IPF floors)."""
        import __ray_entry__ as entrymod

        docs = [(k, "A", "en") for k in range(5)]
        docs += [(k, "B", "en") for k in range(5, 10)]
        self._write(tmp_path, docs)
        out = entrymod._q_kish_neff(str(tmp_path)).iloc[0]
        assert out["n_samp"] == 5
        assert out["n_eff_milli"] == 4_799
        assert out["deff_milli"] == 1_041
