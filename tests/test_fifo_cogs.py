"""FIFO vs weighted-average cost basis of returned stock."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _li(rows):
    return pd.DataFrame(rows, columns=[
        "l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_quantity", "l_extendedprice", "l_returnflag"])


def test_fifo_vs_wavg_holding_gain(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d = pd.Timestamp("2024-01-01")
    rows = [
        # part 1: cheap early buy (10 @ $1/u), pricey late buy
        # (10 @ $3/u); 12 returned → FIFO: all of buy1 (1000c) +
        # 2/10 of buy2 (3000·2//10 = 600) = 1600c;
        # WAVG: 12·4000//20 = 2400c — the holding-gain gap
        (1, 1, 1, d, 10, 10.00, "N"),
        (1, 2, 1, d + pd.Timedelta(days=5), 10, 30.00, "N"),
        (1, 3, 1, d + pd.Timedelta(days=6), 12, 99.0, "R"),
        # part 2: oversold (returns 50 > bought 10) consumes all
        (2, 4, 1, d, 10, 20.00, "N"),
        (2, 5, 1, d, 50, 1.0, "R"),
        # part 3: no returns → no row
        (3, 6, 1, d, 5, 5.00, "N"),
        # part 4: returns but NO buys → uncostable, no row
        (4, 7, 1, d, 5, 5.00, "R"),
    ]
    pq.write_table(pa.Table.from_pandas(_li(rows), preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = (entrymod._q_fifo_cogs(str(tmp_path)).to_pandas()
           .set_index("partkey"))
    assert set(out.index) == {1, 2}
    assert out.loc[1, "sold_qty"] == 12
    assert out.loc[1, "fifo_cogs_cents"] == 1000 + 3000 * 2 // 10
    assert out.loc[1, "wavg_cogs_cents"] == 12 * 4000 // 20
    assert out.loc[1, "fifo_cogs_cents"] < out.loc[1, "wavg_cogs_cents"]
    # oversold: both bases consume the whole inventory
    assert out.loc[2, "fifo_cogs_cents"] == 2000
    assert out.loc[2, "wavg_cogs_cents"] == 2000


def test_fifo_ordering_is_shipdate_then_keys(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d = pd.Timestamp("2024-01-01")
    # same shipdate: orderkey breaks the tie — buy in order 1 is
    # consumed first even though it appears later in the file
    rows = [
        (1, 2, 1, d, 10, 30.00, "N"),
        (1, 1, 1, d, 10, 10.00, "N"),
        (1, 3, 1, d, 10, 9.0, "R"),
    ]
    pq.write_table(pa.Table.from_pandas(_li(rows), preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = entrymod._q_fifo_cogs(str(tmp_path)).to_pandas().iloc[0]
    assert out["fifo_cogs_cents"] == 1000  # the $1/u buy, not $3/u
