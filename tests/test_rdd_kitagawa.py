"""Sharp RDD jump and Kitagawa mix/rate decomposition."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestRddJump:
    def test_two_point_exact_ols(self, ray_session, tmp_path):
        """Left side (u=-2,-1 with y=0,1) fits slope 1, intercept 2 at
        the cutoff; right side (u=0,1 with y=1,0) fits slope -1,
        intercept 1 -> jump = -1e6. Users at x=40 and x=90 sit outside
        the bandwidth and must not move the fit."""
        import __ray_entry__ as entrymod

        ts = pd.Timestamp("2024-01-01")
        rows = []

        def add_user(uid, n_views, conv):
            nonlocal rows
            if conv:
                rows.append((uid, ts, "purchase", 200.0))
            rows += [(uid, ts, "view", 1.0)] * n_views

        add_user(1, 64, False)      # x=64, u=-2, y=0
        add_user(2, 64, True)       # x=65, u=-1, y=1
        add_user(3, 65, True)       # x=66, u=0,  y=1
        add_user(4, 67, False)      # x=67, u=1,  y=0
        add_user(5, 40, False)      # outside bandwidth
        add_user(6, 89, True)       # outside bandwidth
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = entrymod._q_rdd_jump(str(tmp_path)).iloc[0]
        assert (out["n_left"], out["n_right"]) == (2, 2)
        assert (out["a_left_ppm"], out["b_left_ppm"]) \
            == (2_000_000, 1_000_000)
        assert (out["a_right_ppm"], out["b_right_ppm"]) \
            == (1_000_000, -1_000_000)
        assert out["jump_ppm"] == -1_000_000


class TestKitagawaDecomp:
    def test_pure_mix_shift_identity(self, ray_session, tmp_path):
        """Within-segment rates constant (seg0 0.2, seg2 0.6) while
        the hour mix shifts toward seg2: ALL change is mix (-50000 /
        +150000 ppm), rate and interaction terms exactly 0, and the
        terms sum to the overall +100000 ppm share change."""
        import __ray_entry__ as entrymod

        d0 = pd.Timestamp("2024-03-04")       # period 0
        d1 = pd.Timestamp("2024-03-06")       # period 1 (mid = d0+1)
        rows = []

        def block(day, hod, n_events, n_purch):
            nonlocal rows
            t = day + pd.Timedelta(hours=hod)
            for i in range(n_purch):
                rows.append((t + pd.Timedelta(seconds=i), "purchase"))
            for i in range(n_events - n_purch):
                rows.append((t + pd.Timedelta(minutes=1, seconds=i),
                             "view"))

        block(d0, 0, 10, 2)
        block(d0, 12, 10, 6)
        block(d1, 0, 5, 1)
        block(d1, 12, 15, 9)
        df = pd.DataFrame(rows, columns=["ts", "event_type"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = (entrymod._q_kitagawa_decomp(str(tmp_path))
               .set_index("seg"))
        assert sorted(out.index) == [0, 2]
        s0, s2 = out.loc[0], out.loc[2]
        assert (s0["c0"], s0["p0"], s0["c1"], s0["p1"]) == (10, 2, 5, 1)
        assert (s0["mix_ppm"], s0["rate_ppm"], s0["inter_ppm"]) \
            == (-50_000, 0, 0)
        assert (s2["mix_ppm"], s2["rate_ppm"], s2["inter_ppm"]) \
            == (150_000, 0, 0)
        total = int((out["mix_ppm"] + out["rate_ppm"]
                     + out["inter_ppm"]).sum())
        assert total == 100_000  # == the overall share change
