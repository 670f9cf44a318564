"""t-closeness TVD audit, universal child predicate, min-max scaling."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest


def test_t_closeness_hand_case(ray_session):
    import ray.data

    from documentai_ray.stages.privacy import t_closeness_audit

    # global: 6 rows, 3 neg → g = {T: 3, F: 3}, N = 6
    # class A: [T, T] (m=2): Σ|c·N − g·m| = |2·6−3·2| + (absent F: 3·2)
    #        = 6 + 6 = 12 → tvd = 12/(2·2·6) = 0.5 → 500000 ppm
    # class B: [T, F, F, F] (m=4): |1·6−3·4| + |3·6−3·4| = 6 + 6 = 12
    #        → tvd = 12/(2·4·6) = 0.25 → 250000 ppm
    t = pa.table({
        "qi": ["A", "A", "B", "B", "B", "B"],
        "s": [True, True, True, False, False, False]})
    out = (t_closeness_audit(ray.data.from_arrow(t), qi_cols=["qi"],
                             sensitive_col="s", t_ppm=300_000,
                             num_partitions=4)
           .to_pandas().set_index("qi"))
    assert out.loc["A", "class_size"] == 2
    assert out.loc["A", "tvd_ppm"] == 500_000
    assert not out.loc["A", "t_close"]
    assert out.loc["B", "tvd_ppm"] == 250_000
    assert bool(out.loc["B", "t_close"])


def test_t_closeness_global_match_is_zero(ray_session):
    import ray.data

    from documentai_ray.stages.privacy import t_closeness_audit

    # both classes mirror the global 50/50 split exactly → TVD = 0
    t = pa.table({"qi": ["A", "A", "B", "B"],
                  "s": [True, False, True, False]})
    out = (t_closeness_audit(ray.data.from_arrow(t), qi_cols=["qi"],
                             sensitive_col="s", t_ppm=0,
                             num_partitions=2).to_pandas())
    assert (out["tvd_ppm"] == 0).all()
    assert out["t_close"].all()


def test_orders_all_ontime_universal_flag(ray_session):
    import os
    import tempfile

    import __ray_entry__ as entrymod

    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": pd.to_datetime(
            ["2024-01-01", "2024-01-01", "2024-01-01"]),
        "o_orderpriority": ["P1", "P1", "P2"]})
    # order 1: both lines within 30d; order 2: one line at 31d → fails;
    # order 3 (P2): exactly 30d → passes (<=)
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2, 3],
        "l_shipdate": pd.to_datetime(
            ["2024-01-05", "2024-01-30", "2024-01-02", "2024-02-01",
             "2024-01-31"])})
    with tempfile.TemporaryDirectory() as d:
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        out = (entrymod._q_orders_all_ontime(d)
               .set_index("o_orderpriority"))
    assert out.loc["P1", "n_orders"] == 2
    assert out.loc["P1", "n_all_ontime"] == 1
    assert out.loc["P1", "ontime_ppm"] == 500_000
    assert out.loc["P2", "n_all_ontime"] == 1
    assert out.loc["P2", "ontime_ppm"] == 1_000_000


def test_minmax_scale_bounds_and_floor(ray_session):
    import os
    import tempfile

    import __ray_entry__ as entrymod

    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "event_type": ["a", "a", "a", "a"],
        "value": [1.00, 2.00, 4.00, 2.50]})
    with tempfile.TemporaryDirectory() as d:
        ev.to_parquet(os.path.join(d, "events.parquet"))
        out = (entrymod._q_minmax_scale(d).to_pandas()
               .set_index("event_id"))
    # lo = 100c, hi = 400c: v=100→0, v=400→1e6, v=200→333333 (floor),
    # v=250→500000
    assert out.loc[1, "scaled_ppm"] == 0
    assert out.loc[3, "scaled_ppm"] == 1_000_000
    assert out.loc[2, "scaled_ppm"] == 333_333
    assert out.loc[4, "scaled_ppm"] == 500_000


def test_minmax_scale_constant_key_raises(ray_session):
    import os
    import tempfile

    import __ray_entry__ as entrymod

    ev = pd.DataFrame({
        "event_id": [1, 2],
        "event_type": ["a", "a"],
        "value": [3.0, 3.0]})
    with tempfile.TemporaryDirectory() as d:
        ev.to_parquet(os.path.join(d, "events.parquet"))
        with pytest.raises(ValueError, match="constant value"):
            entrymod._q_minmax_scale(d)
