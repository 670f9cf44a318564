"""Kaplan-Meier trunc-ppm fold and reciprocal-rank retrieval eval."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_km_survival_hand_fold(ray_session):
    import ray.data

    from documentai_ray.stages.windows import km_survival_int

    # corpus max = day10 12:00 (u3's last event).
    # u4: single event day5 → lifetime 0, quiet 5.5d → death day 0
    # u1: day0→day2 → death day 2;  u2: day0→day3 → death day 3
    # u3: day0→day10.5 → censored (quiet 0 < 6h), at risk throughout
    base = pd.Timestamp("2024-01-01")
    rows = [("u1", base), ("u1", base + pd.Timedelta(days=2)),
            ("u2", base), ("u2", base + pd.Timedelta(days=3)),
            ("u3", base), ("u3", base + pd.Timedelta(days=10, hours=12)),
            ("u4", base + pd.Timedelta(days=5))]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = km_survival_int(ray.data.from_pandas(ev), horizon_days=5,
                          censor_gap_hours=6).set_index("day")
    # day0: 4 at risk, u4 dies → s = 750000
    assert (out.loc[0, "at_risk"], out.loc[0, "deaths"]) == (4, 1)
    assert out.loc[0, "s_ppm"] == 750_000
    assert out.loc[0, "hazard_ppm"] == 250_000
    # day1: 3 at risk, none die
    assert (out.loc[1, "at_risk"], out.loc[1, "deaths"]) == (3, 0)
    assert out.loc[1, "s_ppm"] == 750_000
    # day2: u1 dies → 750000·2//3 = 500000
    assert out.loc[2, "s_ppm"] == 500_000
    assert out.loc[2, "hazard_ppm"] == 333_333
    # day3: 2 at risk (u2 dying, u3 censored later) → 250000
    assert (out.loc[3, "at_risk"], out.loc[3, "deaths"]) == (2, 1)
    assert out.loc[3, "s_ppm"] == 250_000
    # day4: only the censored u3 remains at risk; curve carries
    assert (out.loc[4, "at_risk"], out.loc[4, "deaths"]) == (1, 0)
    assert out.loc[4, "s_ppm"] == 250_000


def test_mrr_eval_and_relevance(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    # corpus-vocab docs: q_rare = [dup, merge] → only d0 has BOTH;
    # q_cust needs customer+order+dup → customer/order absent → no doc
    # relevant even though 'dup' alone produces a ranking; q_exec terms
    # all absent → empty ranking → zeros.
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["dup merge", "merge merge", "dup dup x"]}),
        os.path.join(tmp_path, "documents.parquet"))
    out = (entrymod._q_mrr_eval(str(tmp_path))
           .set_index("query_id"))
    assert out.loc["q_rare", "n_rel"] == 1
    assert out.loc["q_rare", "first_rank"] == 1
    assert out.loc["q_rare", "rr_ppm"] == 1_000_000
    assert out.loc["q_cust", "n_rel"] == 0
    assert out.loc["q_cust", "rr_ppm"] == 0
    assert out.loc["q_exec", "n_rel"] == 0
    assert out.loc["q_exec", "first_rank"] == 0
