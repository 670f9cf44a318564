"""XmR control chart and Tukey-fence outlier census."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_xmr_spike_flags_alternation_does_not(ray_session):
    import ray.data

    from documentai_ray.stages.windows import xmr_alarms_int

    base = pd.Timestamp("2024-04-01")
    rows = []
    # A: seven quiet hours then a spike — MRsum 20 from the single
    # jump; 100·7·|200−60| = 98000 > 266·8·20 = 42560 → one alarm
    for t in range(7):
        rows += [("A", base + pd.Timedelta(hours=t))] * 5
    rows += [("A", base + pd.Timedelta(hours=7))] * 25
    # B: stationary alternation 3/7 — its own wiggle inflates MRsum
    # (28) so nothing alarms: 700·16 = 11200 < 59584
    for t in range(8):
        rows += [("B", base + pd.Timedelta(hours=t))] * (3 if t % 2 == 0
                                                         else 7)
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    out = xmr_alarms_int(ray.data.from_pandas(ev))
    assert len(out) == 1
    assert out["event_type"].iloc[0] == "A"
    assert str(out["hr"].iloc[0]) == "2024-04-01 07:00:00"
    assert out["c"].iloc[0] == 25


def test_tukey_hinges_and_fences(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # sorted [1,10,11,12,13,14,15,50], m=8: lower half (1,10,11,12)
    # hinge = (10+11)/2 → q1₂=21; upper half (13,14,15,50) hinge =
    # (14+15)/2 → q3₂=29; IQR₂=8 → fences ×4: lo=42−24=18 (4.5),
    # hi=58+24=82 (20.5) → outliers 1 (low) and 50 (high)
    vals = [1, 10, 11, 12, 13, 14, 15, 50]
    df = pd.DataFrame({"l_quantity": [float(v) for v in vals],
                       "l_returnflag": ["N"] * len(vals)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = entrymod._q_tukey_outliers(str(tmp_path)).iloc[0]
    assert out["n"] == 8
    assert (out["q1_x2"], out["q3_x2"]) == (21, 29)
    assert (out["fence_lo_x4"], out["fence_hi_x4"]) == (18, 82)
    assert (out["n_out_lo"], out["n_out_hi"]) == (1, 1)
