"""Youden operating point and block-tie average precision."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _li(tmp_path, qty_flag_pairs):
    df = pd.DataFrame(qty_flag_pairs,
                      columns=["l_quantity", "l_returnflag"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))


def test_youden_picks_max_j(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # s3: 2 pos; s2: 1 pos + 1 neg; s1: 3 neg → P=3, N=4
    # t=3: J = 666666; t=2: J = 1e6 − 250000 = 750000 ← max; t=1: 0
    rows = ([(3.0, "R")] * 2 + [(2.0, "R"), (2.0, "N")]
            + [(1.0, "N")] * 3)
    _li(tmp_path, rows)
    out = entrymod._q_youden_threshold(str(tmp_path)).iloc[0]
    assert out["threshold"] == 2
    assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (3, 1, 0, 3)
    assert out["tpr_ppm"] == 1_000_000
    assert out["fpr_ppm"] == 250_000
    assert out["youden_ppm"] == 750_000


def test_youden_tie_takes_smallest_threshold(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # both candidates score J = 0 → the smaller (more sensitive) wins
    rows = [(3.0, "R"), (3.0, "N"), (2.0, "R"), (2.0, "N")]
    _li(tmp_path, rows)
    out = entrymod._q_youden_threshold(str(tmp_path)).iloc[0]
    assert out["threshold"] == 2
    assert out["youden_ppm"] == 0


def test_average_precision_block_ties(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    rows = ([(3.0, "R")] * 2 + [(2.0, "R"), (2.0, "N")]
            + [(1.0, "N")] * 3)
    _li(tmp_path, rows)
    out = entrymod._q_average_precision(str(tmp_path)).iloc[0]
    # block s3: 1e6·2·2 // (2·3) = 666666; block s2: 1e6·1·3 // (4·3)
    # = 250000; rel-free block s1 contributes nothing
    assert out["n_pos"] == 3 and out["n_neg"] == 4
    assert out["ap_ppm"] == 666_666 + 250_000
