"""Spillover-exposure diagnostic and Mantel-Haenszel stratified uplift."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_users(tmp_path, users):
    """users: (uid, n_ev, conv) -> 1 purchase + n_ev-1 views."""
    ts = pd.Timestamp("2024-01-01")
    rows = []
    for uid, n_ev, conv in users:
        rows.append((uid, ts, "purchase", 200.0 if conv else 100.0))
        rows += [(uid, ts, "view", 1.0)] * (n_ev - 1)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestSpilloverExposure:
    def test_hand_neighborhoods(self, ray_session, tmp_path):
        """Users 0..9 (coins: treated {0,2,4,5,7}); interior users
        2..7 get exposures 2,3,2,2,3,1; converters {2,3} land one in
        the expo-2 bucket (rate 333333) and one in expo-3 (500000)."""
        import __ray_entry__ as entrymod

        _write_users(tmp_path, [(k, 3, k in (2, 3))
                                for k in range(10)])
        out = (entrymod._q_spillover_exposure(str(tmp_path))
               .set_index("exposure"))
        assert sorted(out.index) == [1, 2, 3]
        assert (out.loc[1, "n_users"], out.loc[1, "n_conv"],
                out.loc[1, "rate_ppm"]) == (1, 0, 0)
        assert (out.loc[2, "n_users"], out.loc[2, "n_conv"],
                out.loc[2, "rate_ppm"]) == (3, 1, 333_333)
        assert (out.loc[3, "n_users"], out.loc[3, "n_conv"],
                out.loc[3, "rate_ppm"]) == (2, 1, 500_000)
        # 10 users minus 4 edge users (0,1,8,9) = 6 interior
        assert int(out["n_users"].sum()) == 6


class TestMhStratified:
    def test_simpson_paradox_pinned(self, ray_session, tmp_path):
        """Activity confounds the crude gap: the top 3 deciles are
        all-treated converters, the middle all-control non-converters;
        every MIXED stratum has zero within-stratum difference. Crude
        reads +600000 (0.8 vs 0.2) while MH pools the within-stratum
        zeros to exactly 0 — the textbook Simpson flip."""
        import __ray_entry__ as entrymod

        order = [2, 4, 5, 7, 10, 12, 13, 1, 15, 3,
                 6, 8, 9, 11, 14, 16, 18, 17, 20, 19]
        converters = {2, 4, 5, 7, 10, 12, 13, 15, 1, 3}
        users = [(uid, 100 - rank, uid in converters)
                 for rank, uid in enumerate(order)]
        _write_users(tmp_path, users)
        out = entrymod._q_mh_stratified(str(tmp_path)).iloc[0]
        assert (out["n"], out["n_strata"]) == (20, 10)
        assert out["crude_uplift_ppm"] == 600_000
        assert out["mh_uplift_ppm"] == 0
        assert out["gap_ppm"] == 600_000

    def test_single_arm_strata_guard(self, ray_session, tmp_path):
        """Only treated users: every stratum is single-arm, all MH
        weights are nt*nc = 0, and the pooled estimate guards to 0
        instead of dividing by zero."""
        import __ray_entry__ as entrymod

        _write_users(tmp_path, [(2, 5, True), (4, 4, False)])
        out = entrymod._q_mh_stratified(str(tmp_path)).iloc[0]
        assert out["mh_uplift_ppm"] == 0
        assert out["crude_uplift_ppm"] == 500_000
