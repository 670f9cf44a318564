"""Permutation-test p-value and CUPED variance reduction."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))


class TestPermutationTest:
    def test_perfect_separation_floors_p(self, ray_session, tmp_path):
        """Conversion == the observed coin exactly (treat {2,4,5,7,10}
        convert, ctrl don't): obs gap 1e6, and none of the 32 hash
        re-randomizations reproduces it -> n_extreme 0 and p hits the
        add-one floor 1/33 = 30303 ppm."""
        import __ray_entry__ as entrymod

        ts = pd.Timestamp("2024-01-01")
        rows = [(k, ts, "purchase",
                 200.0 if k in (2, 4, 5, 7, 10) else 100.0)
                for k in range(1, 11)]
        _write(tmp_path, rows)
        out = entrymod._q_permutation_test(str(tmp_path)).iloc[0]
        assert (out["n"], out["b_reps"]) == (10, 32)
        assert out["obs_gap_ppm"] == 1_000_000
        assert out["n_extreme"] == 0
        assert out["p_ppm"] == 30_303

    def test_null_data_maxes_p(self, ray_session, tmp_path):
        """Nobody converts: every gap (observed and re-randomized) is
        0, all 32 replicates tie -> p = 33/33 = 1e6."""
        import __ray_entry__ as entrymod

        ts = pd.Timestamp("2024-01-01")
        _write(tmp_path, [(k, ts, "view", 1.0) for k in range(1, 11)])
        out = entrymod._q_permutation_test(str(tmp_path)).iloc[0]
        assert out["obs_gap_ppm"] == 0
        assert out["n_extreme"] == 32
        assert out["p_ppm"] == 1_000_000


class TestCupedAdjust:
    def test_hand_theta_and_double_floor(self, ray_session, tmp_path):
        """x_k = k pre-period views, converters {1,2}, purchases on
        day 20 (post-period, excluded from x), one extra view on day
        16 for user 1 (also past the 15-day cut). Sums: sx 55, sy 2,
        sxy 3, sxx 385 -> theta = -(80e6//825) = -96969; arms split
        28/27 on x -> xgap = 200000; uplift 0; correction =
        -(96969*200000 // 1e6) = -19393 -> adj +19393."""
        import __ray_entry__ as entrymod

        d0 = pd.Timestamp("2024-01-01")
        rows = []
        for k in range(1, 11):
            rows += [(k, d0, "view", 1.0)] * k
            rows.append((k, d0 + pd.Timedelta(days=20), "purchase",
                         200.0 if k <= 2 else 100.0))
        rows.append((1, d0 + pd.Timedelta(days=16), "view", 1.0))
        _write(tmp_path, rows)
        out = entrymod._q_cuped_adjust(str(tmp_path)).iloc[0]
        assert (out["n"], out["n_treat"]) == (10, 5)
        assert out["theta_ppm"] == -96_969
        assert out["uplift_ppm"] == 0
        assert out["xgap_ppm"] == 200_000
        assert out["correction_ppm"] == -19_393
        assert out["adj_uplift_ppm"] == 19_393
