"""Exposure fairness audit and quantile treatment effects."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestExposureFairness:
    def test_hand_harmonic_shares(self, ray_session, tmp_path):
        """A holds ranks 1-2 (exposure 1.5e6 of 2083333 total ->
        719999+ ppm vs 500000 item share, disparity +220000); B holds
        ranks 3-4 with a SAME-n_chars tie broken by doc_id asc
        (exposure 583333 -> 279999, disparity -220001 — the flooring
        asymmetry is the contract)."""
        import __ray_entry__ as entrymod

        docs = [(1, "A", 400), (2, "A", 300),
                (3, "B", 200), (4, "B", 200)]
        df = pd.DataFrame(docs, columns=["doc_id", "source",
                                         "n_chars"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = (entrymod._q_exposure_fairness(str(tmp_path))
               .set_index("source"))
        a, b = out.loc["A"], out.loc["B"]
        assert (a["n_topk"], a["exposure"]) == (2, 1_500_000)
        assert (a["exp_share_ppm"], a["item_share_ppm"],
                a["disparity_ppm"]) == (720_000, 500_000, 220_000)
        assert (b["n_topk"], b["exposure"]) == (2, 583_333)
        assert (b["exp_share_ppm"], b["disparity_ppm"]) \
            == (279_999, -220_001)


class TestQteQuantiles:
    def test_median_up_tail_down(self, ray_session, tmp_path):
        """Treated purchase values 100/200/300c, control 100/100/500c:
        medians differ +100 while the p75/p90 tail differs -200 — the
        distributional story a mean comparison (both ~200) hides.
        Rank = ceil(p*n), no interpolation."""
        import __ray_entry__ as entrymod

        ts = pd.Timestamp("2024-01-01")
        rows = [
            (2, ts, "purchase", 1.00), (4, ts, "purchase", 2.00),
            (5, ts, "purchase", 3.00),                  # treat arm
            (1, ts, "purchase", 1.00), (3, ts, "purchase", 1.00),
            (6, ts, "purchase", 5.00),                  # ctrl arm
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = (entrymod._q_qte_quantiles(str(tmp_path))
               .set_index("p_pct"))
        assert list(out.index) == [25, 50, 75, 90]
        assert out.loc[25].tolist() == [100, 100, 0]
        assert out.loc[50].tolist() == [200, 100, 100]
        assert out.loc[75].tolist() == [300, 500, -200]
        assert out.loc[90].tolist() == [300, 500, -200]
