"""Page's L ordered trend test and Harrell's survival C-index."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestPageTrend:
    def test_rising_activity_significant(self, ray_session, tmp_path):
        """Three users each with 1/2/3/4 events in the four quarters:
        doubled rank sums (6,12,18,24), L' = 180, E = 150, D = 30,
        z² = 36·900/3600 = 9.000 → significant with trend_sign +1 —
        the monotone alternative Friedman would dilute."""
        base = pd.Timestamp("2024-01-01")
        span_days = 27
        rows = []
        for uid in (1, 2, 3):
            for j, frac in enumerate([0.0, 1 / 3, 2 / 3, 1.0]):
                t = base + pd.Timedelta(days=span_days * frac)
                for i in range(j + 1):
                    rows.append((uid, t + pd.Timedelta(seconds=i),
                                 "view", 0.0))
        _events(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_page_trend(str(tmp_path)).set_index("bucket")
        assert out["rsum2"].tolist() == [6, 12, 18, 24]
        assert out["l2"].iloc[0] == 180
        assert out["z2_milli"].iloc[0] == 9000
        assert out["trend_sign"].iloc[0] == 1
        assert out["significant"].all()

    def test_flat_reads_zero(self, ray_session, tmp_path):
        """Identical counts per quarter: every block fully tied,
        L' = E[L'], z² = 0."""
        base = pd.Timestamp("2024-01-01")
        rows = []
        for uid in (1, 2):
            for frac in [0.0, 1 / 3, 2 / 3, 1.0]:
                t = base + pd.Timedelta(days=27 * frac)
                rows.append((uid, t, "view", 0.0))
        _events(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_page_trend(str(tmp_path))
        assert out["z2_milli"].iloc[0] == 0
        assert out["trend_sign"].iloc[0] == 0
        assert not out["significant"].any()


class TestSurvivalCindex:
    def _corpus(self, tmp_path, a_events):
        """A: T=1 observed; B: T=2 observed (3 events); C: T=2
        censored at corpus max (2 events)."""
        rows = []
        # A: a_events events spread over Jan 5 -> Jan 6 (T = 1 day)
        for i in range(a_events):
            rows.append((1, pd.Timestamp("2024-01-05")
                         + pd.Timedelta(hours=i * 24 // (a_events - 1)
                                        if a_events > 1 else 0),
                         "view", 0.0))
        # B: 3 events Jan 2 -> Jan 4 (T = 2 days, observed)
        for d in (0, 1, 2):
            rows.append((2, pd.Timestamp("2024-01-02")
                         + pd.Timedelta(days=d), "view", 0.0))
        # C: 2 events Jan 8 -> Jan 10 (= corpus max -> censored)
        rows.append((3, pd.Timestamp("2024-01-08"), "view", 0.0))
        rows.append((3, pd.Timestamp("2024-01-10"), "view", 0.0))
        _events(tmp_path, rows)

    def test_perfect_concordance(self, ray_session, tmp_path):
        """Scores 5/3/2 align exactly with who dies sooner: all
        three comparable pairs concordant → 10⁶ ppm.  The (B,C)
        pair is the same-time event-vs-censored case — comparable
        by contract."""
        self._corpus(tmp_path, a_events=5)
        import __ray_entry__ as entrymod

        out = entrymod._q_survival_cindex(str(tmp_path)).iloc[0]
        assert (out["n_users"], out["n_events"]) == (3, 2)
        assert (out["comp2"], out["c2"]) == (6, 6)
        assert out["c_index_ppm"] == 1_000_000

    def test_score_tie_half_credit(self, ray_session, tmp_path):
        """A's score lowered to tie B (3 events each): the (A,B)
        pair earns half credit → c2 = 5, 833333 ppm."""
        self._corpus(tmp_path, a_events=3)
        import __ray_entry__ as entrymod

        out = entrymod._q_survival_cindex(str(tmp_path)).iloc[0]
        assert (out["comp2"], out["c2"]) == (6, 5)
        assert out["c_index_ppm"] == 833_333
