"""BM25 integer scoring, Fano dispersion index, lead-lag slope."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest


def test_bm25_saturation_rarity_and_exact_scores(ray_session):
    import ray.data

    from documentai_ray.stages.indexing import bm25_topk

    # N=3, L=10; df_x=3 → idf_x = 1e6·1//4 = 250000;
    # df_z=1 → idf_z = 1e6·3//2 = 1500000
    docs = pa.table({"doc_id": [0, 1, 2],
                     "text": ["x x x x", "x z y y", "x x"]})
    out = bm25_topk(ray.data.from_arrow(docs),
                    queries={"q_sat": ["x"], "q_rare": ["z"],
                             "q_none": ["nope"]}, k=5)
    sat = out[out["query_id"] == "q_sat"].set_index("doc_id")
    # d0 tf4 dl4: 250000·880 // (400+30+108) = 220e6 // 538
    assert sat.loc[0, "score_ppm"] == 220_000_000 // 538
    # d2 tf2 dl2: 250000·440 // (200+30+54) = 110e6 // 284
    assert sat.loc[2, "score_ppm"] == 110_000_000 // 284
    # d1 tf1 dl4: 250000·220 // (100+30+108) = 55e6 // 238
    assert sat.loc[1, "score_ppm"] == 55_000_000 // 238
    # saturation: 4× the tf scores well under 4× (and shorter d2 beats
    # the same-idf longer d1)
    assert list(sat.sort_values("rank").index) == [0, 2, 1]
    assert sat.loc[0, "score_ppm"] < 2 * sat.loc[2, "score_ppm"]
    rare = out[out["query_id"] == "q_rare"]
    assert len(rare) == 1
    assert rare["doc_id"].iloc[0] == 1
    assert rare["score_ppm"].iloc[0] == 330_000_000 // 238
    # a term absent from the corpus contributes nothing, loudly not NaN
    assert (out["query_id"] == "q_none").sum() == 0


def _hourly_events(spec):
    rows = []
    eid = 0
    for etype, hour, n in spec:
        for _ in range(n):
            rows.append((etype,
                         pd.Timestamp("2024-01-01") + pd.Timedelta(hours=hour),
                         eid))
            eid += 1
    return pd.DataFrame(rows, columns=["event_type", "ts", "event_id"])


def test_dispersion_index_hand_case(ray_session):
    import ray.data

    from documentai_ray.stages.windows import dispersion_index_int

    # A: [4,0,0,0] → n=4 S=4 Q=16 → D = (64−16)/16 = 3 → overdispersed
    # B: [1,1,1,1] → Q=4 → D = 0 → not
    ev = _hourly_events([("A", 0, 4),
                         ("B", 0, 1), ("B", 1, 1), ("B", 2, 1), ("B", 3, 1)])
    out = dispersion_index_int(ray.data.from_pandas(ev)).set_index(
        "event_type")
    assert out.loc["A", "dispersion_ppm"] == 3_000_000
    assert bool(out.loc["A", "overdispersed"])
    assert out.loc["A", "total"] == 4 and out.loc["A", "n_obs"] == 4
    assert out.loc["B", "dispersion_ppm"] == 0
    assert not out.loc["B", "overdispersed"]


def test_leadlag_beta_shifted_series(ray_session):
    import ray.data

    from documentai_ray.stages.windows import leadlag_beta_int

    # click [1,0,1,0], purchase [0,1,0,1]: xc=[2,−2,2,−2], yc=[−2,2,−2,2]
    # den=16; lag0 num=−16 → −1e6; lag1 num=12 → 750000
    ev = _hourly_events([("click", 0, 1), ("click", 2, 1),
                         ("purchase", 1, 1), ("purchase", 3, 1)])
    out = leadlag_beta_int(ray.data.from_pandas(ev), x_type="click",
                           y_type="purchase", lags=(0, 1)).set_index("lag")
    assert out.loc[0, "beta_ppm"] == -1_000_000
    assert out.loc[1, "beta_ppm"] == 750_000
    assert (out["n_obs"] == 4).all()


def test_leadlag_beta_absent_key_raises(ray_session):
    import ray.data

    from documentai_ray.stages.windows import leadlag_beta_int

    ev = _hourly_events([("click", 0, 1), ("click", 1, 2)])
    with pytest.raises(ValueError, match="absent"):
        leadlag_beta_int(ray.data.from_pandas(ev), x_type="click",
                         y_type="purchase", lags=(0,))
