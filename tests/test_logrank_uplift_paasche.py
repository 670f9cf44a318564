"""Log-rank survival A/B, uplift-by-decile, Paasche index."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_logrank_hand_fold(ray_session):
    import ray.data

    from documentai_ray.stages.windows import logrank_test_int

    # ctrl (1, 3) die day 1; treat (2, 13) die day 3; treat 4 censored
    # at the horizon-capped lifetime (last event IS corpus max).
    # day1: e1 += 1e6·3·2//5, v += 1e6·3·2·2·3//(25·4) = 360000
    # day3: e1 += 1e6·3·2//3 (n0 = 0 → v term 0); O1 = 2
    base = pd.Timestamp("2024-01-01")
    rows = []
    for u, end in [(1, 1), (3, 1), (2, 3), (13, 3), (4, 10)]:
        rows += [(u, base), (u, base + pd.Timedelta(days=end))]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = logrank_test_int(ray.data.from_pandas(ev), horizon_days=5,
                           censor_gap_hours=6).iloc[0]
    assert (out["n_treat"], out["n_ctrl"]) == (3, 2)
    assert out["o1"] == 2
    assert out["e1_ppm"] == 1_200_000 + 2_000_000
    assert out["v_ppm"] == 360_000
    # (2e6 − 3.2e6)² // (1000·360000) = 4000; 1.44e12 > 3841459·360000
    assert out["logrank_milli"] == 4000
    assert bool(out["significant"])


def test_uplift_deciles_single_user_cells(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # uid k has 11−k events → decile k; converts iff k ≤ 5.
    # Knuth coins: treat {2,4,5,7,10}, ctrl {1,3,6,8,9}.
    ts = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(1, 11):
        rows.append((k, ts, "purchase", 200.0 if k <= 5 else 100.0))
        rows += [(k, ts, "view", 1.0)] * (10 - k)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = (entrymod._q_uplift_deciles(str(tmp_path))
           .set_index("decile"))
    assert len(out) == 10
    treat = {2, 4, 5, 7, 10}
    for k in range(1, 11):
        row = out.loc[k]
        if k in treat:
            assert (row["n_treat"], row["n_ctrl"]) == (1, 0)
            expect = 1_000_000 if k <= 5 else 0
            assert row["rate_treat_ppm"] == expect
            assert row["uplift_ppm"] == expect
        else:
            assert (row["n_treat"], row["n_ctrl"]) == (0, 1)
            expect = 1_000_000 if k <= 5 else 0
            assert row["rate_ctrl_ppm"] == expect
            assert row["uplift_ppm"] == -expect


def test_paasche_mirrors_laspeyres_floor(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d0, d10 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-11")
    rows = [(1, d0, 2, 10.00), (1, d10, 4, 30.00),
            (2, d0, 1, 5.00), (2, d10, 3, 6.00),
            (3, d0, 5, 99.00), (4, d10, 5, 99.00)]
    df = pd.DataFrame(rows, columns=["l_partkey", "l_shipdate",
                                     "l_quantity", "l_extendedprice"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = entrymod._q_paasche_index(str(tmp_path)).iloc[0]
    # Σs₁ = 3600 exact; base repriced = 1000·4//2 + 500·3//1 = 3500
    assert out["n_parts"] == 2
    assert out["current_value_cents"] == 3600
    assert out["repriced_base_cents"] == 3500
    assert out["paasche_ppm"] == 1_000_000 * 3600 // 3500
    # the pair brackets the substitution effect: paasche ≤ laspeyres
    lasp = entrymod._q_laspeyres_index(str(tmp_path)).iloc[0]
    assert out["paasche_ppm"] <= lasp["laspeyres_ppm"]
