"""Wilcoxon signed-rank test and Nelson-Aalen cumulative hazard."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    df["ts"] = pd.to_datetime(df["ts"], format="mixed")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestWilcoxonSigned:
    def test_hand_all_positive(self, ray_session, tmp_path):
        """Three users gaining 1/2/3 events in the second half (and
        one unchanged user DROPPED by the zero rule): doubled ranks
        2/4/6, W'₊ = 12, D = 6, var12 = 2·3·4·7 = 168 →
        z² = 12·36/168 = 2.571; three pairs can't clear chi²₁."""
        rows = []
        # corpus window pinned by user 9: one event at each end
        rows.append((9, "2024-01-01 00:00:00", "view", 0.0))
        rows.append((9, "2024-01-31 00:00:00", "view", 0.0))
        gains = {1: 1, 2: 2, 3: 3}
        for uid, gain in gains.items():
            rows.append((uid, "2024-01-02", "view", 0.0))   # first half
            rows.append((uid, "2024-01-20", "view", 0.0))   # second
            for i in range(gain):
                rows.append((uid, f"2024-01-2{1 + i}", "view", 0.0))
        _events(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_wilcoxon_signed(str(tmp_path)).iloc[0]
        # user 9's d = 0 -> dropped
        assert out["n_nonzero"] == 3
        assert out["w2_pos"] == 12
        assert out["t3"] == 0
        assert out["var12"] == 168
        assert out["z2_milli"] == 2571
        assert out["shift_sign"] == 1
        assert not out["significant"]

    def test_tie_midranks(self, ray_session, tmp_path):
        """Diffs +1, −1, +2: |d| ties at 1 take doubled midrank 3,
        |2| takes 6 → W'₊ = 9, D = 3, T₃ = 6, var12 = 162,
        z² = 12·9/162 = 0.666."""
        rows = []
        rows.append((9, "2024-01-01 00:00:00", "view", 0.0))
        rows.append((9, "2024-01-31 00:00:00", "view", 0.0))
        # +1
        rows.append((1, "2024-01-02", "view", 0.0))
        rows.append((1, "2024-01-20", "view", 0.0))
        rows.append((1, "2024-01-21", "view", 0.0))
        # -1
        rows.append((2, "2024-01-02", "view", 0.0))
        rows.append((2, "2024-01-03", "view", 0.0))
        rows.append((2, "2024-01-20", "view", 0.0))
        # +2
        rows.append((3, "2024-01-02", "view", 0.0))
        rows.append((3, "2024-01-20", "view", 0.0))
        rows.append((3, "2024-01-21", "view", 0.0))
        rows.append((3, "2024-01-22", "view", 0.0))
        _events(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_wilcoxon_signed(str(tmp_path)).iloc[0]
        assert (out["n_nonzero"], out["w2_pos"]) == (3, 9)
        assert (out["t3"], out["var12"]) == (6, 162)
        assert out["z2_milli"] == 666


class TestNelsonAalen:
    def test_hand_cumulative(self, ray_session, tmp_path):
        """Four users: one death at day 1 (4 at risk), two at day 3
        (3 at risk — the censored survivor u4 still counts), then
        nothing: hazard floors 250000 and 666666 ADD to 916666 and
        hold through day 29 (KM would MULTIPLY: 750000·1//3 =
        250000 — the two estimators' structural difference)."""
        rows = []
        # corpus max pinned at Jan 20 by the censored survivor u4
        rows.append((4, "2024-01-01 00:00:00", "view", 0.0))
        rows.append((4, "2024-01-20 00:00:00", "view", 0.0))
        # u1: lifetime 1 day, observed
        rows.append((1, "2024-01-01", "view", 0.0))
        rows.append((1, "2024-01-02", "view", 0.0))
        # u2: lifetime 3 days, observed
        rows.append((2, "2024-01-01", "view", 0.0))
        rows.append((2, "2024-01-04", "view", 0.0))
        # u3: lifetime 3 days, observed
        rows.append((3, "2024-01-05", "view", 0.0))
        rows.append((3, "2024-01-08", "view", 0.0))
        _events(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_nelson_aalen(str(tmp_path)).set_index("day")
        assert out.loc[1, "at_risk"] == 4
        assert out.loc[1, "deaths"] == 1
        assert out.loc[1, "cumhaz_ppm"] == 250_000
        assert out.loc[3, "at_risk"] == 3
        assert out.loc[3, "deaths"] == 2
        assert out.loc[3, "cumhaz_ppm"] == 916_666
        assert out.loc[29, "cumhaz_ppm"] == 916_666
