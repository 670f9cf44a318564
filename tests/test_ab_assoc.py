"""A/B chi-square readout and directional association rules."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Knuth-coin arms (uid·2654435761 % 2³² < 2³¹):
TREAT = [2, 4, 5, 7, 10, 12, 13]
CTRL = [1, 3, 6, 8, 9, 11, 14]


def _events(uids_vals):
    ts = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        [(u, ts, "purchase", v) for u, v in uids_vals],
        columns=["user_id", "ts", "event_type", "value"])


def test_ab_conversion_significant_split(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # all treated convert (≥150), no control does → a=7 b=0 c=0 d=7:
    # chi2 = 14·49²/(7·7·7·7)·... = N·det²/den = 14·2401/2401 = 14
    df = _events([(u, 200.0) for u in TREAT]
                 + [(u, 100.0) for u in CTRL])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = entrymod._q_ab_conversion(str(tmp_path)).iloc[0]
    assert (out["n_treat"], out["n_ctrl"]) == (7, 7)
    assert (out["conv_treat"], out["conv_ctrl"]) == (7, 0)
    assert out["rate_treat_ppm"] == 1_000_000
    assert out["uplift_ppm"] == 1_000_000
    assert out["chi2_milli"] == 14_000
    assert bool(out["significant"])


def test_ab_conversion_insignificant(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # treated 4/7 vs control 3/7: det = 4·4−3·3 = 7,
    # chi2_milli = 1000·14·49 // 2401 = 285 < 3841 → not significant
    df = _events([(u, 200.0) for u in TREAT[:4]]
                 + [(u, 100.0) for u in TREAT[4:]]
                 + [(u, 200.0) for u in CTRL[:3]]
                 + [(u, 100.0) for u in CTRL[3:]])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = entrymod._q_ab_conversion(str(tmp_path)).iloc[0]
    assert out["chi2_milli"] == 285
    assert not bool(out["significant"])


def test_assoc_rules_directional(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # baskets: o1{A,A,B} o2{A,B} o3{A} o4{B,C} o5{A,C} (A=1,B=2,C=3);
    # only (A,B) reaches support 2; supp A=4, B=3, baskets=5
    rows = [(1, 1), (1, 1), (1, 2), (2, 1), (2, 2), (3, 1),
            (4, 2), (4, 3), (5, 1), (5, 3)]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = (entrymod._q_assoc_rules(str(tmp_path)).to_pandas()
           .set_index(["antecedent", "consequent"]))
    assert len(out) == 2  # both directions, sub-support pairs dropped
    # A→B: 2/4 = 50%; B→A: 2/3 = 66.7% — direction matters
    assert out.loc[(1, 2), "conf_ppm"] == 500_000
    assert out.loc[(2, 1), "conf_ppm"] == 666_666
    # lift symmetric: 1e6·2·5 // (4·3) = 833333
    assert out.loc[(1, 2), "lift_ppm"] == 833_333
    assert out.loc[(2, 1), "lift_ppm"] == 833_333
    assert out.loc[(1, 2), "supp_ab"] == 2
    assert out.loc[(1, 2), "supp_a"] == 4
    assert out.loc[(2, 1), "supp_a"] == 3
