"""Pinball quantile loss and cohort LTV accumulation."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_pinball_eval_asymmetry(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # shared 49-hour grid (day0 00:00 .. day2 00:00); hod-0 slots per
    # type over 3 days:
    #  A: [1, 2, 0] → m2 = 2, d = (0, 2, −2) → p50 = 20, p90 = 20
    #  B: [1, 0, 4] → m2 = 2, d = (0, −2, 6) → p50 = 40,
    #     p90 = 0 + 2 + 54 = 56 (under-prediction costs 9×)
    base = pd.Timestamp("2024-01-01")
    rows = []
    rows += [("A", base)] * 1 + [("A", base + pd.Timedelta(days=1))] * 2
    rows += [("B", base)] * 1 + [("B", base + pd.Timedelta(days=2))] * 4
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = (entrymod._q_pinball_eval(str(tmp_path))
           .set_index("event_type"))
    assert (out["n_obs"] == 49).all()
    assert out.loc["A", "pinball50_d20"] == 20
    assert out.loc["A", "pinball90_d20"] == 20
    assert out.loc["B", "pinball50_d20"] == 40
    assert out.loc["B", "pinball90_d20"] == 56


def test_cohort_ltv_offsets_and_cum(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    t0 = pd.Timestamp("2024-01-01")
    wk = pd.Timedelta(days=7)
    rows = [
        # u1: cohort week W via a non-purchase first event; purchases
        # in weeks W and W+1
        (1, t0, "view", 1.0),
        (1, t0 + pd.Timedelta(hours=2), "purchase", 10.0),
        (1, t0 + wk, "purchase", 20.0),
        # u2: first seen in W+1, purchases immediately
        (2, t0 + wk, "purchase", 5.0),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = entrymod._q_cohort_ltv(str(tmp_path))
    w0 = int(t0.value // 1000 // 604_800_000_000)
    out = out.set_index(["cohort_week", "week_offset"])
    assert out.loc[(w0, 0), "revenue_cents"] == 1000
    assert out.loc[(w0, 1), "revenue_cents"] == 2000
    assert out.loc[(w0, 1), "cum_revenue_cents"] == 3000
    assert out.loc[(w0 + 1, 0), "revenue_cents"] == 500
    assert out.loc[(w0 + 1, 0), "cum_revenue_cents"] == 500
    assert len(out) == 3
