"""Histogram nearest-neighbor matching ATT and add-k EB shrinkage."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestMatchingAtt:
    def test_selection_bias_removed(self, ray_session, tmp_path):
        """Treated users cluster at high activity where EVERYONE
        converts: naive diff reads 166667 ppm, but each treated user
        converts exactly like its nearest-activity control, so ATT is
        exactly 0 and bias_removed = the whole naive gap. The x=25
        treated user ties between ctrl values 20 and 30 and must take
        the SMALLER (rate 0)."""
        import __ray_entry__ as entrymod

        ts = pd.Timestamp("2024-01-01")
        rows = []

        def user(uid, n_views, conv):
            nonlocal rows
            rows.append((uid, ts, "purchase",
                         200.0 if conv else 100.0))
            rows += [(uid, ts, "view", 1.0)] * n_views

        # ctrl {1,3,6}: x=10 y0, x=20 y0, x=30 y1
        user(1, 9, False)
        user(3, 19, False)
        user(6, 29, True)
        # treat {2,4,5,7}: x=29 y1, x=31 y1, x=9 y0, x=25 y0 (tie)
        user(2, 28, True)
        user(4, 30, True)
        user(5, 8, False)
        user(7, 24, False)
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = entrymod._q_matching_att(str(tmp_path)).iloc[0]
        assert (out["n_treat"], out["n_ctrl"]) == (4, 3)
        assert out["att_ppm"] == 0
        assert out["naive_diff_ppm"] == 166_667
        assert out["bias_removed_ppm"] == 166_667


class TestEbShrink:
    def test_small_segment_moves_most(self, ray_session, tmp_path):
        """A: 2/2 en (raw 1e6), B: 2/8 (raw 250000); corpus mean 0.4
        with k=50: A shrinks to 220e6//520 = 423076 (move -576924),
        B to 220e6//580 = 379310 (move +129310) — the tiny segment
        does almost all the moving."""
        import __ray_entry__ as entrymod

        rows = [("A", "en")] * 2 + [("B", "en")] * 2 \
            + [("B", "de")] * 6
        df = pd.DataFrame(rows, columns=["source", "lang"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = (entrymod._q_eb_shrink(str(tmp_path))
               .set_index("source"))
        a, b = out.loc["A"], out.loc["B"]
        assert (a["raw_ppm"], a["shrunk_ppm"], a["move_ppm"]) \
            == (1_000_000, 423_076, -576_924)
        assert (b["raw_ppm"], b["shrunk_ppm"], b["move_ppm"]) \
            == (250_000, 379_310, 129_310)
