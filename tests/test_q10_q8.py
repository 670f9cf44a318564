"""TPC-H-shaped Q10 returns report and Q8 market share."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _w(tmp_path, name, **cols):
    pq.write_table(pa.table(cols), os.path.join(tmp_path,
                                                f"{name}.parquet"))


def test_q10_returns_hand(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    _w(tmp_path, "nation", n_nationkey=[0, 1], n_name=["N0", "N1"],
       n_regionkey=[0, 0])
    _w(tmp_path, "customer", c_custkey=[1, 2],
       c_name=["Cust1", "Cust2"], c_nationkey=[0, 1])
    _w(tmp_path, "orders", o_orderkey=[1, 2, 3], o_custkey=[1, 2, 1])
    _w(tmp_path, "lineitem",
       l_orderkey=[1, 1, 2, 3],
       l_returnflag=["R", "N", "R", "R"],
       l_extendedprice=[100.0, 999.0, 50.0, 1.0],
       l_discount=[0.10, 0.0, 0.0, 0.05])
    out = entrymod._q_q10_returns(str(tmp_path))
    # c1: 10000·90 + 100·95 = 909500 c4 → 9095 cents (ONE floor);
    # c2: 5000·100 = 500000 → 5000; non-R line excluded
    assert list(out["custkey"]) == [1, 2]
    assert list(out["revenue_cents"]) == [9095, 5000]
    assert list(out["rank"]) == [1, 2]
    assert list(out["n_name"]) == ["N0", "N1"]


def test_q8_market_share_hand(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    _w(tmp_path, "nation", n_nationkey=[0, 1, 2],
       n_name=["N0", "N1", "N2"], n_regionkey=[0, 0, 1])
    _w(tmp_path, "supplier", s_suppkey=[1, 2], s_nationkey=[1, 2])
    _w(tmp_path, "customer", c_custkey=[1, 2], c_nationkey=[0, 2])
    _w(tmp_path, "orders", o_orderkey=[1, 2, 3], o_custkey=[1, 1, 2],
       o_orderdate=pd.to_datetime(["1995-03-01", "1996-05-01",
                                   "1995-07-01"]))
    _w(tmp_path, "lineitem",
       l_orderkey=[1, 1, 2, 3],
       l_suppkey=[1, 2, 1, 2],
       l_extendedprice=[100.0, 100.0, 50.0, 77.0],
       l_discount=[0.0, 0.0, 0.10, 0.0])
    out = (entrymod._q_q8_market_share(str(tmp_path))
           .set_index("o_year"))
    # 1995: region-0 customer c1's order o1 only (c2 is region 1):
    # total 2·10⁶ c4, target (supplier-nation 1) 10⁶ → 500000 ppm
    assert out.loc[1995, "total_c4"] == 2_000_000
    assert out.loc[1995, "target_c4"] == 1_000_000
    assert out.loc[1995, "share_ppm"] == 500_000
    # 1996: only the target supplier sells → share = 1e6
    assert out.loc[1996, "total_c4"] == 450_000
    assert out.loc[1996, "share_ppm"] == 1_000_000
    assert len(out) == 2  # the region-1 customer's 1995 order is out
