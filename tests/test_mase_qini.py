"""MASE scaled forecast error and Qini/AUUC cumulative uplift."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestNaiveMase:
    def test_hand_fold_both_lags(self, ray_session):
        """Counts h0=3,h1=5,h2=4,h3=4,h24=6,h25=5,h26=9,h27=4 and an
        isolated h55 (no counterpart at lag 1 OR 24).
        Lag-1 pairs: 2,1,0,1,4,5 -> n1=6, sae1=13 (h24 has no h23).
        Lag-24 pairs: 3,0,5,0 -> n24=4, sae24=8.
        mase_ppm = 1e6*8*6 // (13*4) = 923076."""
        from documentai_ray.stages.windows import naive_mase
        base = pd.Timestamp("2024-03-01")
        rows = []
        for h, n in ((0, 3), (1, 5), (2, 4), (3, 4), (24, 6),
                     (25, 5), (26, 9), (27, 4), (55, 2)):
            for i in range(n):
                rows.append({"ts": base + pd.Timedelta(hours=h,
                                                       seconds=i),
                             "k": "t"})
        out = naive_mase(
            ray_session.data.from_items(rows).repartition(3),
            ts_col="ts", key_col="k").to_pandas()
        assert out.iloc[0].to_dict() == {
            "k": "t", "n_pairs_season": 4, "sae_season": 8,
            "n_pairs_naive": 6, "sae_naive": 13,
            "mase_ppm": 48_000_000 // 52}

    def test_constant_series_guards_zero(self, ray_session):
        """A constant series has sae_naive = 0 -> no scale to measure
        against -> mase_ppm = 0 by the guard (not a crash)."""
        from documentai_ray.stages.windows import naive_mase
        base = pd.Timestamp("2024-03-01")
        rows = []
        for h in range(30):
            for i in range(3):
                rows.append({"ts": base + pd.Timedelta(hours=h,
                                                       seconds=i),
                             "k": "t"})
        out = naive_mase(
            ray_session.data.from_items(rows),
            ts_col="ts", key_col="k").to_pandas()
        assert out.iloc[0]["sae_season"] == 0
        assert out.iloc[0]["sae_naive"] == 0
        assert out.iloc[0]["mase_ppm"] == 0


def _one_user_per_decile_events(tmp_path, conv_users):
    """uid k has 11-k events -> decile k; converts iff k in conv_users.
    Knuth coins split users: treat {2,4,5,7,10}, ctrl {1,3,6,8,9}."""
    ts = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(1, 11):
        val = 200.0 if k in conv_users else 100.0
        rows.append((k, ts, "purchase", val))
        rows += [(k, ts, "view", 1.0)] * (10 - k)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestQiniAuuc:
    def test_hand_cumulative_fold(self, ray_session, tmp_path):
        """Converters k<=5. Cumulative cells give qini
        [0,0,0,0,0,1,1,1,2,1] (the d7 floor 8//3=2 and the d9 jump
        8//5=1 checked by hand), auuc ends at 6, and with q10=1 the
        random diagonal is 0 until d=10."""
        import __ray_entry__ as entrymod

        _one_user_per_decile_events(tmp_path, {1, 2, 3, 4, 5})
        out = entrymod._q_qini_auuc(str(tmp_path))
        assert list(out["decile"]) == list(range(1, 11))
        assert list(out["qini"]) == [0, 0, 0, 0, 0, 1, 1, 1, 2, 1]
        assert list(out["auuc_cum"]) == [0, 0, 0, 0, 0, 1, 2, 3, 5, 6]
        assert list(out["rand_base"]) == [0] * 9 + [1]
        assert list(out["gain"]) == [0, 0, 0, 0, 0, 1, 1, 1, 2, 0]
        assert out.iloc[-1][["cum_n_treat", "cum_conv_treat",
                             "cum_n_ctrl", "cum_conv_ctrl"]] \
            .tolist() == [5, 3, 5, 2]

    def test_negative_q10_sign_split(self, ray_session, tmp_path):
        """Only CONTROL users convert -> q10 = -5. The random diagonal
        must truncate toward zero on the negative value (sign-split):
        rand_1 = -((1*5)//10) = 0, where a Python floor of (1*-5)//10
        would give -1 and diverge from the DuckDB mirror."""
        import __ray_entry__ as entrymod

        _one_user_per_decile_events(tmp_path, {1, 3, 6, 8, 9})
        out = entrymod._q_qini_auuc(str(tmp_path))
        assert list(out["qini"]) == [0, -1, -1, -2, -3,
                                     -3, -4, -4, -4, -5]
        assert out.iloc[-1]["qini"] == -5
        assert list(out["rand_base"]) == [0, -1, -1, -2, -2,
                                          -3, -3, -4, -4, -5]
        assert out.iloc[0]["rand_base"] == 0  # NOT the floor's -1
        assert list(out["gain"]) == [0, 0, 0, 0, -1, 0, -1, 0, 0, 0]
