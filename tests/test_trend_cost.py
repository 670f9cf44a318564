"""Cochran-Armitage trend test and cost-optimal threshold."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestCochranArmitage:
    def test_hand_decreasing_trend(self, ray_session, tmp_path):
        """One user per decile (uid k has 11-k events), converters in
        deciles 1..3: T = 10*6 - 3*55 = -105, B = 825, den =
        3*7*825 = 17325 -> chi2 = 110250000//17325 = 6363 milli,
        significant (1.1e11 > 6.66e10), trend_sign -1."""
        import __ray_entry__ as entrymod

        ts = pd.Timestamp("2024-01-01")
        rows = []
        for k in range(1, 11):
            rows.append((k, ts, "purchase",
                         200.0 if k <= 3 else 100.0))
            rows += [(k, ts, "view", 1.0)] * (10 - k)
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = entrymod._q_cochran_armitage(str(tmp_path)).iloc[0]
        assert (out["n"], out["r"]) == (10, 3)
        assert out["trend_sign"] == -1
        assert out["chi2_milli"] == 6363
        assert bool(out["significant"])


class TestCostThreshold:
    def test_profit_tie_takes_smaller_threshold(self, ray_session,
                                                tmp_path):
        """Sweep: t=50 -> profit 15, t=40 -> 8, t=30 -> 15 (tie!),
        t=20 -> 5. The tie takes the SMALLER threshold 30 (more
        sensitive queue at equal profit); profit_all = 5 shows the
        chosen point beats classify-everything by 3x."""
        import __ray_entry__ as entrymod

        rows = []

        def li(qty, flag, n):
            nonlocal rows
            rows += [(float(qty), flag)] * n

        li(50, "R", 5)
        li(40, "R", 1)
        li(40, "N", 10)
        li(30, "R", 3)
        li(30, "N", 2)
        li(20, "N", 10)
        df = pd.DataFrame(rows, columns=["l_quantity", "l_returnflag"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))
        out = entrymod._q_cost_threshold(str(tmp_path)).iloc[0]
        assert out["threshold"] == 30
        assert (out["tp"], out["fp"], out["fn"], out["tn"]) \
            == (9, 12, 0, 10)
        assert out["profit"] == 15
        assert out["profit_all"] == 5
