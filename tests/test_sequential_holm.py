"""Group-sequential looks and Holm step-down correction."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path):
    """10 users over a 10-day span; treat {2,4,5,7,10} convert on
    day 4, controls never; user 9 anchors day 9."""
    d = lambda k: pd.Timestamp("2024-03-01") + pd.Timedelta(days=k)
    rows = []
    for uid in range(1, 11):
        rows.append((uid, d(0), "view", 1.0))
    for uid in (2, 4, 5, 7, 10):
        rows.append((uid, d(4), "purchase", 200.0))
    rows.append((9, d(9), "view", 1.0))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestSequentialLooks:
    def test_crossing_at_third_look(self, ray_session, tmp_path):
        """Looks cut at days 1/3/5/7/9. The day-4 perfectly-separated
        conversion is invisible at looks 1-2 (chi2 0) and crosses the
        Bonferroni boundary from look 3 on (chi2 = 10.000 > 6.635):
        the monitoring table shows exactly when the evidence
        arrived."""
        import __ray_entry__ as entrymod

        _write(tmp_path)
        out = (entrymod._q_sequential_looks(str(tmp_path))
               .set_index("look"))
        assert list(out.index) == [1, 2, 3, 4, 5]
        assert out.loc[1, "chi2_milli"] == 0
        assert not bool(out.loc[1, "crossed"])
        assert not bool(out.loc[2, "crossed"])
        for k in (3, 4, 5):
            assert out.loc[k, "chi2_milli"] == 10_000
            assert bool(out.loc[k, "crossed"])
        assert out.loc[3, "n"] == 10
        assert out.loc[3, "n_conv"] == 5


class TestHolmBonferroni:
    def test_step_down_stops_at_first_failure(self, ray_session,
                                              tmp_path):
        """Only 'converted' separates the arms (chi2 10.000, beats
        the strictest rank-1 crit 6634897); the other four metrics
        are all-zero and the step-down stops at rank 2 — exactly one
        rejection, with the remaining ranks ordered by metric name on
        the chi2 tie."""
        import __ray_entry__ as entrymod

        _write(tmp_path)
        out = (entrymod._q_holm_bonferroni(str(tmp_path))
               .set_index("metric"))
        assert out.loc["converted", "rank"] == 1
        assert out.loc["converted", "chi2_milli"] == 10_000
        assert out.loc["converted", "crit_ppm"] == 6_634_897
        assert bool(out.loc["converted", "rejected"])
        assert not out.drop("converted")["rejected"].any()
        ties = out.drop("converted").sort_values("rank")
        assert list(ties.index) == ["any_click", "any_error",
                                    "high_activity", "repeat_buyer"]
