"""Split-conformal backtest interval and cohort CAC payback day."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestConformalBacktest:
    def test_hand_threshold_and_coverage(self, ray_session):
        """Hours 0..23 count 3, hours 24..47 count 5 except hour 26
        (count 10): all pair scores are 2 except hour 26's 7. The
        epoch-hour coin splits 24..47 into 12 cal / 12 test with hour
        26 in the TEST half (verified by the documented hash), so the
        calibration half is all-2s: k = (9*12+18)//10 = 12, threshold
        2, and coverage = 11/12 -> 916666 ppm."""
        from documentai_ray.stages.windows import conformal_backtest
        base = pd.Timestamp("2024-03-01")
        rows = []
        for h in range(48):
            n = 3 if h < 24 else (10 if h == 26 else 5)
            for i in range(n):
                rows.append({"ts": base + pd.Timedelta(hours=h,
                                                       seconds=i),
                             "et": "t"})
        out = conformal_backtest(
            ray_session.data.from_items(rows).repartition(3),
            ts_col="ts", key_col="et").to_pandas()
        row = out.iloc[0]
        assert (row["n_cal"], row["n_test"]) == (12, 12)
        assert row["k"] == 12
        assert row["threshold"] == 2
        assert (row["n_covered"], row["coverage_ppm"]) == (11, 916_666)

    def test_keys_without_both_halves_drop(self, ray_session):
        """A key whose pairs all land in one half is dropped rather
        than emitting a degenerate threshold: one single pair hour ->
        either n_cal or n_test is 0."""
        from documentai_ray.stages.windows import conformal_backtest
        base = pd.Timestamp("2024-03-01")
        rows = [{"ts": base, "et": "solo"},
                {"ts": base + pd.Timedelta(hours=24), "et": "solo"}]
        out = conformal_backtest(
            ray_session.data.from_items(rows),
            ts_col="ts", key_col="et").to_pandas()
        assert len(out) == 0


class TestCohortPayback:
    def test_two_cohorts_crossing_and_never(self, ray_session,
                                            tmp_path):
        """Cohort week 2826 (2 users, CAC 60000c): revenue 20000c on
        offsets 0 and 1, 25000c on offset 2 -> cum crosses 60000 at
        day 2. Cohort week 2827 (1 user): total 10000c < 30000c ->
        payback -1."""
        import __ray_entry__ as entrymod

        b = pd.Timestamp("2024-03-04")  # epoch day 19786, %7 == 4
        rows = [
            (1, b, "purchase", 200.0),
            (1, b + pd.Timedelta(days=2), "purchase", 250.0),
            (2, b + pd.Timedelta(days=1), "purchase", 200.0),
            (3, b + pd.Timedelta(days=7), "purchase", 100.0),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = (entrymod._q_cohort_payback(str(tmp_path))
               .set_index("cohort_week"))
        a = out.loc[19786 // 7]
        assert (a["n_users"], a["cac_cents"]) == (2, 60_000)
        assert a["total_revenue_cents"] == 65_000
        assert a["payback_day"] == 2
        c = out.loc[(19786 + 7) // 7]
        assert (c["n_users"], c["total_revenue_cents"],
                c["payback_day"]) == (1, 10_000, -1)

    def test_offset_from_first_event_not_first_purchase(
            self, ray_session, tmp_path):
        """A view two days before the first purchase starts the clock:
        the 35000c purchase lands at offset 2, so payback_day is 2
        even though it is the user's first purchase."""
        import __ray_entry__ as entrymod

        b = pd.Timestamp("2024-03-04")
        rows = [(1, b, "view", 1.0),
                (1, b + pd.Timedelta(days=2), "purchase", 350.0)]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        out = entrymod._q_cohort_payback(str(tmp_path)).iloc[0]
        assert out["payback_day"] == 2
