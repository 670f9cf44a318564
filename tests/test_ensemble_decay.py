"""2-of-3 anomaly consensus and dyadic time-decay attribution."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestAnomalyEnsemble:
    def test_short_history_spike_gets_two_votes(self, ray_session,
                                                tmp_path):
        """Flat 3/hour for 72 hours with a 50 burst in the last hour:
        global 3-sigma and XmR both vote, but the spike's OWN
        hour-of-day peer group has only m=3 members and a lone spike
        needs m > 10 to beat the variance it itself inflates (the
        (m-1)^2 > 9(m-1) algebra) — so the hod rule abstains and the
        alert fires at exactly votes=2 with (1,1,0)."""
        import __ray_entry__ as entrymod

        base = pd.Timestamp("2024-03-01")
        rows = []
        for h in range(72):
            n = 50 if h == 71 else 3
            for i in range(n):
                rows.append((base + pd.Timedelta(hours=h, seconds=i),
                             "t"))
        df = pd.DataFrame(rows, columns=["ts", "event_type"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = entrymod._q_anomaly_ensemble(str(tmp_path))
        assert len(out) == 1
        r = out.iloc[0]
        assert r["c"] == 50
        assert (r["vote_global"], r["vote_xmr"], r["vote_hod"]) \
            == (1, 1, 0)
        assert r["votes"] == 2


class TestAttributionDecay:
    def test_dyadic_weights_and_boundaries(self, ray_session,
                                           tmp_path):
        """u1: click 5 min before the purchase (bucket 0, w=32) and a
        view 55 min before (bucket 5, w=1): credits 1e6*32//33 =
        969696 and 30303. u2 pins the window edges: a click EXACTLY
        1h before is the k=5 boundary (sole touch, full 1e6), a
        same-timestamp signup and a 1h+1s error are outside the
        half-open window."""
        import __ray_entry__ as entrymod

        t1 = pd.Timestamp("2024-03-01 12:00:00")
        t2 = pd.Timestamp("2024-03-02 12:00:00")
        rows = [
            (1, t1, "purchase", 1),
            (1, t1 - pd.Timedelta(minutes=5), "click", 2),
            (1, t1 - pd.Timedelta(minutes=55), "view", 3),
            (2, t2, "purchase", 4),
            (2, t2 - pd.Timedelta(hours=1), "click", 5),
            (2, t2, "signup", 6),
            (2, t2 - pd.Timedelta(hours=1, seconds=1), "error", 7),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "event_id"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = (entrymod._q_attribution_decay(str(tmp_path))
               .to_pandas().set_index("event_type"))
        assert sorted(out.index) == ["click", "view"]
        assert (out.loc["click", "n_touches"],
                out.loc["click", "credit_ppm"]) == (2, 1_969_696)
        assert (out.loc["view", "n_touches"],
                out.loc["view", "credit_ppm"]) == (1, 30_303)
