"""Hour-of-day anomaly, difference-in-differences, Laspeyres index."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_seasonal_anomaly_hod_peer_groups(ray_session):
    import ray.data

    from documentai_ray.stages.windows import seasonal_anomaly_int

    # 11-day grid: hod-3 peers [0]*10 + [5] → z = √10 > 3 → flagged
    # ((55−5)² = 2500 > 9·250 = 2250); the two lone grid-edge events
    # flag too (any nonzero among 10 dead peers is > 3σ)
    base = pd.Timestamp("2024-03-01")
    rows = [("A", base)]
    rows += [("A", base + pd.Timedelta(days=10, hours=3))] * 5
    rows += [("A", base + pd.Timedelta(days=10, hours=23))]
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    out = seasonal_anomaly_int(ray.data.from_pandas(ev))
    got = {(r.event_type, str(r.hr), int(r.c))
           for r in out.itertuples(index=False)}
    assert got == {
        ("A", "2024-03-01 00:00:00", 1),
        ("A", "2024-03-11 03:00:00", 5),
        ("A", "2024-03-11 23:00:00", 1)}


def test_seasonal_vs_global_anomaly_disagree(ray_session):
    import ray.data

    from documentai_ray.stages.windows import seasonal_anomaly_int

    # a daytime-heavy series: noon hours carry 100±small, 3am carries 0
    # except ONE 3am hour with 8 — tiny globally, huge for its hod
    # grid starts at the first noon, so hod-3 has 11 peers over 12
    # days ([0]*10 + [8]: z = √10 > 3; with only 10 peers a lone
    # spike sits at exactly 3σ and must NOT flag)
    base = pd.Timestamp("2024-03-01")
    rows = []
    for d in range(12):
        rows += [("A", base + pd.Timedelta(days=d, hours=12))] * 100
        if d == 11:
            rows += [("A", base + pd.Timedelta(days=d, hours=3))] * 8
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    out = seasonal_anomaly_int(ray.data.from_pandas(ev))
    hrs = set(str(h) for h in out["hr"])
    assert "2024-03-12 03:00:00" in hrs  # 3am spike caught
    # the constant-100 noon hours never flag (zero variance but x == μ)
    assert not any(h.endswith("12:00:00") for h in hrs)


def test_did_estimator_hand_cells(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # Knuth coin: uid 1, 3 → control; uid 2, 13 → treated
    pre, post = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-31")
    rows = [
        (1, pre, "purchase", 10.00), (1, post, "purchase", 20.00),
        (3, pre, "purchase", 10.00), (3, post, "purchase", 20.00),
        (2, pre, "purchase", 10.00), (2, post, "purchase", 35.50),
        (13, pre, "purchase", 10.00), (13, post, "purchase", 35.50),
        # non-purchase noise far earlier: must not move the midpoint
        (1, pd.Timestamp("2023-06-01"), "view", 9999.0),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = entrymod._q_did_estimator(str(tmp_path)).iloc[0]
    assert (out["n_ctrl_pre"], out["n_ctrl_post"]) == (2, 2)
    assert (out["n_treat_pre"], out["n_treat_post"]) == (2, 2)
    assert out["m_ctrl_pre_mc"] == 1_000_000      # $10 in milli-cents
    assert out["m_ctrl_post_mc"] == 2_000_000
    assert out["m_treat_post_mc"] == 3_550_000
    # (3.55e6 − 1e6) − (2e6 − 1e6) = 1.55e6 mc = $15.50 uplift
    assert out["did_mc"] == 1_550_000


def test_laspeyres_index_repricing(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d0 = pd.Timestamp("2024-01-01")
    d10 = pd.Timestamp("2024-01-11")  # mid = day 5 → post
    rows = [
        # part 1: base q=2 @ $10 total; post q=4 @ $30 → v1 = 3000·2//4
        (1, d0, 2, 10.00), (1, d10, 4, 30.00),
        # part 2: base q=1 @ $5; post q=3 @ $6 → v1 = 600·1//3 = 200
        (2, d0, 1, 5.00), (2, d10, 3, 6.00),
        # parts traded in only one period drop from the basket
        (3, d0, 5, 99.00), (4, d10, 5, 99.00),
    ]
    df = pd.DataFrame(rows, columns=["l_partkey", "l_shipdate",
                                     "l_quantity", "l_extendedprice"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = entrymod._q_laspeyres_index(str(tmp_path)).iloc[0]
    assert out["n_parts"] == 2
    assert out["base_value_cents"] == 1500
    assert out["repriced_value_cents"] == 1500 + 200
    assert out["laspeyres_ppm"] == 1_000_000 * 1700 // 1500
