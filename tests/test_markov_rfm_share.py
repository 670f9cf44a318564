"""k-step Markov fold, RFM quintile segmentation, ratio-to-parent shares."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events(rows):
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                       "value", "event_id"])


def test_markov_kstep_hand_fold(ray_session):
    import ray.data

    from documentai_ray.stages.windows import markov_kstep_int

    # one user, sequence A A B A B → transitions A→A:1, A→B:2, B→A:1
    # rows: A=3, B=1 → p_AA=333333, p_AB=666666, p_BA=1000000
    # v0 = [500000, 500000]
    # step1: v_A = (500000·333333 + 500000·1000000)//1e6 = 666666
    #        v_B = (500000·666666)//1e6                  = 333333
    # step2: v_A = (666666·333333 + 333333·1000000)//1e6 = 555554
    #        v_B = (666666·666666)//1e6                  = 444443
    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                         "2024-01-01 02:00:00", "2024-01-01 03:00:00",
                         "2024-01-01 04:00:00"])
    ev = _events([("u1", ts[i], t, 1.0, i)
                  for i, t in enumerate(["A", "A", "B", "A", "B"])])
    out = markov_kstep_int(ray.data.from_pandas(ev), steps=2,
                           num_partitions=4).set_index("event_type")
    assert out.loc["A", "p0_ppm"] == 500_000
    assert out.loc["B", "p0_ppm"] == 500_000
    assert out.loc["A", "pk_ppm"] == 555_554
    assert out.loc["B", "pk_ppm"] == 444_443


def test_markov_kstep_absorbing_leak_raises(ray_session):
    import ray.data

    from documentai_ray.stages.windows import markov_kstep_int

    # A→B only: B holds mass from v0 but has no outgoing row → loud
    ev = _events([("u1", pd.Timestamp("2024-01-01 00:00:00"), "A", 1.0, 0),
                  ("u1", pd.Timestamp("2024-01-01 01:00:00"), "B", 1.0, 1)])
    with pytest.raises(ValueError, match="absorbing leak"):
        markov_kstep_int(ray.data.from_pandas(ev), steps=1,
                         num_partitions=2)


def test_rfm_segments_quintiles_and_purchase_filter(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # 5 purchasers, strictly ordered on all three metrics: user k has
    # (6-k) purchases of $100, last purchase on Jan (11-k) → with n=5
    # the rule 1 + 5·ri//5 = 1 + ri gives user k quintile k on R, F, M.
    rows = []
    eid = 0
    for k in range(1, 6):
        for j in range(6 - k):
            rows.append((f"u{k}",
                         pd.Timestamp(f"2024-01-{11 - k:02d}")
                         - pd.Timedelta(hours=j),
                         "purchase", 100.0, eid))
            eid += 1
    # a later non-purchase with a huge value must not move t_max/monetary
    rows.append(("u5", pd.Timestamp("2024-02-01"), "view", 9999.0, eid))
    df = _events(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))

    out = (entrymod._q_rfm_segments(str(tmp_path))
           .to_pandas().set_index("user_id"))
    assert len(out) == 5
    for k in range(1, 6):
        u = out.loc[f"u{k}"]
        assert u["recency_d"] == k - 1
        assert u["frequency"] == 6 - k
        assert u["monetary_d"] == 100 * (6 - k)
        assert (u["r_q"], u["f_q"], u["m_q"]) == (k, k, k)
        assert u["rfm_code"] == 111 * k


def test_revenue_share_two_level(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    pq.write_table(pa.table({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [1, 2, 3],
        "o_totalprice": [100.0, 300.0, 600.0]}),
        os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": [1, 2, 3], "c_nationkey": [0, 1, 2]}),
        os.path.join(tmp_path, "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": [0, 1, 2], "n_name": ["N1", "N2", "N3"],
        "n_regionkey": [0, 0, 1]}),
        os.path.join(tmp_path, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": [0, 1], "r_name": ["R1", "R2"]}),
        os.path.join(tmp_path, "region.parquet"))

    out = (entrymod._q_revenue_share(str(tmp_path))
           .set_index("n_name"))
    # R1 total 40000c, R2 60000c, global 100000c
    assert out.loc["N1", "share_region_ppm"] == 250_000
    assert out.loc["N2", "share_region_ppm"] == 750_000
    assert out.loc["N3", "share_region_ppm"] == 1_000_000
    assert out.loc["N1", "share_global_ppm"] == 100_000
    assert out.loc["N2", "share_global_ppm"] == 300_000
    assert out.loc["N3", "share_global_ppm"] == 600_000
    assert out.loc["N3", "revenue_cents"] == 60_000
