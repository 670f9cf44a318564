"""Pooled-vs-within panel slope."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _day(d: int) -> pd.Timestamp:
    return pd.Timestamp("1970-01-01") + pd.Timedelta(days=d)


class TestFePanel:
    def test_composition_bias_pinned(self, ray_session, tmp_path):
        """Big spender (1000c/month) active months 10-11, small
        (100c) months 12-13: both are FLAT within, but the pooled
        slope reads the composition: -360 cents/month
        (-360000000 ppm). Within reads exactly 0; gap = pooled.
        Month-10 revenue arrives as TWO 5.00 orders, pinning the
        (cust, month) pre-aggregation."""
        import __ray_entry__ as entrymod

        rows = [
            (1, _day(10 * 30), 5.0), (1, _day(10 * 30 + 3), 5.0),
            (1, _day(11 * 30), 10.0),
            (2, _day(12 * 30), 1.0), (2, _day(13 * 30), 1.0),
        ]
        df = pd.DataFrame(rows, columns=["o_custkey", "o_orderdate",
                                         "o_totalprice"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "orders.parquet"))
        out = entrymod._q_fe_panel(str(tmp_path)).iloc[0]
        assert (out["n_obs"], out["n_groups"]) == (4, 2)
        assert out["pooled_slope_ppm"] == -360_000_000
        assert out["within_slope_ppm"] == 0
        assert out["gap_ppm"] == -360_000_000
