"""Hour-profile earth-mover distance and arc price elasticity."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MON = pd.Timestamp("2024-03-04")   # dd 19786, (dd+4)%7 = 1 -> weekday
SAT = pd.Timestamp("2024-03-09")   # dd 19791, (dd+4)%7 = 6 -> weekend


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["ts", "event_type"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestEmdHourly:
    def test_shift_distance_is_hours_moved(self, ray_session,
                                           tmp_path):
        """The geometry TVD can't see: 4 weekday events at hour 0 vs
        4 weekend events at hour 12 -> EMD 12.000 (12 hours moved);
        the same mass at hour 1 -> EMD 1.000. TVD calls both 'total
        disagreement'."""
        import __ray_entry__ as entrymod

        rows = []
        for i in range(4):
            rows.append((MON + pd.Timedelta(seconds=i), "far"))
            rows.append((SAT + pd.Timedelta(hours=12, seconds=i),
                         "far"))
            rows.append((MON + pd.Timedelta(seconds=i), "near"))
            rows.append((SAT + pd.Timedelta(hours=1, seconds=i),
                         "near"))
        _write_events(tmp_path, rows)
        out = (entrymod._q_emd_hourly(str(tmp_path))
               .set_index("event_type"))
        assert (out.loc["far", "n_weekday"],
                out.loc["far", "n_weekend"]) == (4, 4)
        assert out.loc["far", "emd_milli"] == 12_000
        assert out.loc["near", "emd_milli"] == 1_000

    def test_one_sided_type_guards_zero(self, ray_session, tmp_path):
        """A type seen only on weekdays has no weekend distribution to
        move mass to: emd_milli = 0 by the guard."""
        import __ray_entry__ as entrymod

        _write_events(tmp_path, [(MON, "wd_only")])
        out = entrymod._q_emd_hourly(str(tmp_path)).iloc[0]
        assert (out["n_weekday"], out["n_weekend"],
                out["emd_milli"]) == (1, 0, 0)


class TestPriceElasticity:
    def _write_lineitem(self, tmp_path, rows):
        df = pd.DataFrame(rows, columns=[
            "l_partkey", "l_shipdate", "l_quantity",
            "l_extendedprice"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))

    def test_unit_elasticity_and_drops(self, ray_session, tmp_path):
        """Part 1: price doubles, quantity halves, revenue constant ->
        arc elasticity exactly -1 (the textbook identity). Part 2:
        unchanged unit value -> den 0 -> drops. Part 3: single period
        -> drops. Part 4: quantity AND price rise -> +1."""
        import __ray_entry__ as entrymod

        d0, d2 = MON, MON + pd.Timedelta(days=2)  # mid = d0+1
        rows = [
            (1, d0, 10.0, 20.0), (1, d2, 5.0, 20.0),
            (2, d0, 10.0, 10.0), (2, d2, 20.0, 20.0),
            (3, d0, 7.0, 7.0),
            (4, d0, 10.0, 10.0), (4, d2, 20.0, 40.0),
        ]
        self._write_lineitem(tmp_path, rows)
        out = (entrymod._q_price_elasticity(str(tmp_path))
               .to_pandas().set_index("partkey"))
        assert sorted(out.index) == [1, 4]
        p1 = out.loc[1]
        assert (p1["q0"], p1["q1"], p1["r0_cents"], p1["r1_cents"]) \
            == (10, 5, 2000, 2000)
        assert p1["elasticity_ppm"] == -1_000_000
        assert out.loc[4, "elasticity_ppm"] == 1_000_000
