"""Reliability-bin calibration (ECE/Brier) and SRM arm-health check."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, users):
    """users: list of (uid, n_ev, conv). Each user gets 1 purchase
    (200 if conv else 100) + (n_ev - 1) views."""
    ts = pd.Timestamp("2024-01-01")
    rows = []
    for uid, n_ev, conv in users:
        rows.append((uid, ts, "purchase", 200.0 if conv else 100.0))
        rows += [(uid, ts, "view", 1.0)] * (n_ev - 1)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestCalibrationBins:
    def test_hand_bins_ece_brier(self, ray_session, tmp_path):
        """p = clamp((n_ev-40)*20000, 0, 1e6). u3 clamps to 0 (bin 0),
        u4 clamps to 1e6 and the bin rule clamps 10 -> 9. Bin 1 holds
        one converter and one not: conf 100000, acc 500000, gap
        400000, brier 8.1e11 + 1e10. ECE = (0 + 2*400000 +
        2*500000) // 5 = 360000."""
        import __ray_entry__ as entrymod

        _write_events(tmp_path, [
            (1, 45, True), (2, 45, False),      # bin 1
            (3, 38, False),                     # clamp -> bin 0
            (4, 95, True), (5, 90, False),      # bin 9 (u4 via clamp)
        ])
        out = (entrymod._q_calibration_bins(str(tmp_path))
               .set_index("bin"))
        assert list(out.index) == [0, 1, 9]
        b0 = out.loc[0]
        assert (b0["n"], b0["n_conv"], b0["conf_ppm"], b0["acc_ppm"],
                b0["gap_ppm"], b0["brier_sum"]) == (1, 0, 0, 0, 0, 0)
        b1 = out.loc[1]
        assert (b1["n"], b1["n_conv"]) == (2, 1)
        assert (b1["conf_ppm"], b1["acc_ppm"], b1["gap_ppm"]) \
            == (100_000, 500_000, 400_000)
        assert b1["brier_sum"] == 810_000_000_000 + 10_000_000_000
        b9 = out.loc[9]
        assert (b9["conf_ppm"], b9["acc_ppm"], b9["gap_ppm"]) \
            == (1_000_000, 500_000, 500_000)
        assert b9["brier_sum"] == 1_000_000_000_000
        assert set(out["ece_ppm"]) == {360_000}


class TestSrmCheck:
    def test_balanced_arms_silent(self, ray_session, tmp_path):
        """uids 1..10 split 5/5 by the Knuth coin (treat
        {2,4,5,7,10}): delta 0, chi2 0, no flag."""
        import __ray_entry__ as entrymod

        _write_events(tmp_path, [(k, 3, False) for k in range(1, 11)])
        out = entrymod._q_srm_check(str(tmp_path)).iloc[0]
        assert (out["n_treat"], out["n_ctrl"], out["delta"],
                out["chi2_milli"]) == (5, 5, 0, 0)
        assert not bool(out["srm_flag"])

    def test_one_sided_arms_flag(self, ray_session, tmp_path):
        """Only the 5 treated uids present: chi2 = 1000*25//5 = 5000
        milli and 25e6 > 3841459*5 -> flagged."""
        import __ray_entry__ as entrymod

        _write_events(tmp_path, [(k, 3, False)
                                 for k in (2, 4, 5, 7, 10)])
        out = entrymod._q_srm_check(str(tmp_path)).iloc[0]
        assert (out["n_treat"], out["n_ctrl"]) == (5, 0)
        assert out["chi2_milli"] == 5000
        assert bool(out["srm_flag"])
