"""IPS/SNIPS off-policy evaluation and BBSE label-shift estimation."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, users):
    """users: (uid, n_purch_200, n_purch_100, n_views)."""
    ts = pd.Timestamp("2024-01-01")
    rows = []
    for uid, p200, p100, views in users:
        rows += [(uid, ts, "purchase", 200.0)] * p200
        rows += [(uid, ts, "purchase", 100.0)] * p100
        rows += [(uid, ts, "view", 1.0)] * views
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestIpsPolicyEval:
    def test_hand_weights(self, ray_session, tmp_path):
        """Coin: treat {2,4,5,7,10}, ctrl {1,3,6,8,9}. Policy arm is 1
        only for uid 2 (70 events); everyone else polls 0, so matches
        are uid 2 + the 5 ctrl users (m=6). Converters uid 1 (ctrl,
        matched) and uid 2 (treat, matched): my=2.
        ips = 2e6*2//10 = 400000, snips = 1e6*2//6 = 333333,
        logged = 200000."""
        import __ray_entry__ as entrymod

        users = [(2, 1, 0, 69), (1, 1, 0, 2)]
        users += [(k, 0, 1, 2) for k in (3, 4, 5, 6, 7, 8, 9, 10)]
        _write_events(tmp_path, users)
        out = entrymod._q_ips_policy_eval(str(tmp_path)).iloc[0]
        assert (out["n"], out["n_match"], out["n_match_conv"]) \
            == (10, 6, 2)
        assert out["logged_ppm"] == 200_000
        assert out["ips_ppm"] == 400_000
        assert out["snips_ppm"] == 333_333


class TestLabelShift:
    def test_perfect_classifier_recovers_prior(self, ray_session,
                                               tmp_path):
        """Source (treat coin): converters get >= 66 events, others
        not -> tpr = 1, fpr = 0, so BBSE collapses to mu and recovers
        the target prior EXACTLY: m=5, m1=2 -> est 400000 == true."""
        import __ray_entry__ as entrymod

        users = [
            # source: uid 2,4 convert w/ 70 events; 5,7,10 don't, 20
            (2, 1, 0, 69), (4, 1, 0, 69),
            (5, 0, 1, 19), (7, 0, 1, 19), (10, 0, 1, 19),
            # target (ctrl coin, >= 12 purchases): 1,3 convert w/ 66+
            # events; 6,8,9 don't and stay under 66
            (1, 1, 11, 54), (3, 1, 11, 58),
            (6, 0, 12, 5), (8, 0, 12, 5), (9, 0, 12, 5),
        ]
        _write_events(tmp_path, users)
        out = entrymod._q_label_shift(str(tmp_path)).iloc[0]
        assert (out["tp"], out["fn"], out["fp"], out["tn"]) \
            == (2, 0, 0, 3)
        assert (out["n_tgt"], out["m1"]) == (5, 2)
        assert (out["tpr_ppm"], out["fpr_ppm"]) == (1_000_000, 0)
        assert out["est_prior_ppm"] == 400_000
        assert out["true_prior_ppm"] == 400_000

    def test_chance_classifier_guards_zero(self, ray_session,
                                           tmp_path):
        """Everyone under 66 events -> yh constant 0 -> den = 0 ->
        est_prior_ppm = 0 by the guard (not a crash)."""
        import __ray_entry__ as entrymod

        users = [(k, 1, 11, 5) for k in range(1, 11)]
        _write_events(tmp_path, users)
        out = entrymod._q_label_shift(str(tmp_path)).iloc[0]
        assert (out["tp"], out["fp"]) == (0, 0)
        assert out["est_prior_ppm"] == 0
