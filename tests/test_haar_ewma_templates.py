"""Haar energy pyramid, dyadic-EWMA backtest, URL template census."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _hourly_events(spec, key="k"):
    """spec: list of (hour_offset, count) → events table."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts, ks = [], []
    for hour, count in spec:
        t = base + np.timedelta64(int(hour), "h")
        for _ in range(count):
            ts.append(t)
            ks.append(key)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array(ks, pa.string())})


def test_haar_two_sample_hand_case(ray_session):
    import ray.data

    from documentai_ray.stages.windows import haar_energy_int

    # x = [3, 1]: m = 2, L = 1; d = 2, A = 4, Σx² = 10
    # total = 2·10 − 16 = 4 = d²·(m/2) = 4·1 ✓ → one level, share 1e6
    out = haar_energy_int(
        ray.data.from_arrow(_hourly_events([(0, 3), (1, 1)])))
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["n_used"], row["level"]) == (2, 1)
    assert row["e_scaled"] == 4 and row["share_ppm"] == 1_000_000


def test_haar_levels_separate_scales(ray_session):
    import ray.data

    from documentai_ray.stages.windows import haar_energy_int

    # block signal [5,5,5,5,0,0,0,1]: the centered energy concentrates
    # at level 3 (the 4-vs-4 split); the lone level-1 pair (0,1)
    # contributes exactly d²·(m/2) = 4
    spec = [(h, 5) for h in range(4)] + [(7, 1)]
    out = haar_energy_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("level")
    # x = [5,5,5,5,0,0,0,1], m = 8: hand Parseval
    x = [5, 5, 5, 5, 0, 0, 0, 1]
    m = 8
    total = m * sum(v * v for v in x) - sum(x) ** 2
    assert out["e_scaled"].sum() == total
    # level 1: pairs (5,5),(5,5),(0,0),(0,1) → d² = 1 → e_scaled = 1·4
    assert out.loc[1, "e_scaled"] == 4
    # level 3 dominates (the block split)
    assert out.loc[3, "share_ppm"] > out.loc[1, "share_ppm"]
    assert out.loc[3, "share_ppm"] > out.loc[2, "share_ppm"]


def test_haar_dyadic_truncation(ray_session):
    import ray.data

    from documentai_ray.stages.windows import haar_energy_int

    # 5 grid hours → m = 4: hour 4 (count 9) is OUTSIDE the dyadic
    # window and must not contribute
    spec = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 9)]
    out = haar_energy_int(ray.data.from_arrow(_hourly_events(spec)))
    assert set(out["n_used"]) == {4}
    x = [1, 2, 3, 4]
    total = 4 * sum(v * v for v in x) - sum(x) ** 2
    assert out["e_scaled"].sum() == total


def test_haar_constant_window_raises(ray_session):
    import ray.data

    from documentai_ray.stages.windows import haar_energy_int

    # constant over the dyadic window (hour 4 differs but is truncated)
    spec = [(h, 3) for h in range(4)] + [(4, 7)]
    with pytest.raises(ValueError, match="constant dyadic window"):
        haar_energy_int(ray.data.from_arrow(_hourly_events(spec)))


def test_ewma_perfect_constant_series_after_warmup(ray_session):
    import ray.data

    from documentai_ray.stages.windows import ewma_backtest_int

    # constant 4/hour over 12 hours: prediction = 255·4/255 = 4 exactly
    spec = [(h, 4) for h in range(12)]
    out = ewma_backtest_int(ray.data.from_arrow(_hourly_events(spec)),
                            window=8)
    row = out.iloc[0]
    assert row["n_eval"] == 4
    assert row["sae_scaled"] == 0 and row["mae_milli"] == 0


def test_ewma_hand_case(ray_session):
    import ray.data

    from documentai_ray.stages.windows import ewma_backtest_int

    # 8 warmup hours 0..7 with counts 1..8, then hour 8 count 10:
    # pred_num = 128·8+64·7+32·6+16·5+8·4+4·3+2·2+1·1 = 1793
    # err = |255·10 − 1793| = 757
    spec = [(h, h + 1) for h in range(8)] + [(8, 10)]
    out = ewma_backtest_int(ray.data.from_arrow(_hourly_events(spec)),
                            window=8)
    row = out.iloc[0]
    assert row["n_eval"] == 1
    assert row["sae_scaled"] == 757
    assert row["mae_milli"] == 1000 * 757 // 255


def test_ewma_short_series_raises(ray_session):
    import ray.data

    from documentai_ray.stages.windows import ewma_backtest_int

    spec = [(h, 1) for h in range(5)]
    with pytest.raises(ValueError, match="grid span"):
        ewma_backtest_int(ray.data.from_arrow(_hourly_events(spec)),
                          window=8)


def test_url_template_batch_shapes():
    from documentai_ray.stages.extract import url_template_batch

    t = pa.table({"link": [
        "https://a.example.com/cat/123/7",
        "https://b.example.com/about",
        "https://a.example.com/p/9?amp=1",
        "https://a.example.com/",
        "http://c.example.com:8080/x2y/3",
    ]})
    out = url_template_batch(t).to_pandas()
    assert list(out["host"]) == ["a.example.com", "b.example.com",
                                 "a.example.com", "a.example.com",
                                 "c.example.com:8080"]
    assert list(out["template"]) == ["/cat/{n}/{n}", "/about",
                                     "/p/{n}?amp={n}", "/", "/x{n}y/{n}"]


def test_url_templates_census_closed_form(ray_session):
    """Engine census equals the closed form on a tiny synthetic corpus."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import (anchor_edges_batch,
                                               url_template_batch)

    ds = pages_dataset("/root/testdata/sf0.001", with_dups=False)
    edges = ds.select_columns(["url", "html"]).map_batches(
        anchor_edges_batch, batch_format="pyarrow", batch_size=256)
    tmpl = edges.map_batches(
        url_template_batch, batch_format="pyarrow").to_pandas()
    census = (tmpl.groupby(["host", "template"]).size()
              .reset_index(name="n"))
    # every host exposes exactly the 8 template shapes (6 fixed + rel + cat)
    shapes = set(census["template"])
    assert "/cat/{n}/{n}" in shapes and "/rel/{n}" in shapes
    assert {"/", "/about", "/contact", "/privacy", "/terms",
            "/subscribe"} <= shapes
    # rel count is even (2 links per article/report page)
    rel = census[census["template"] == "/rel/{n}"]
    assert (rel["n"] % 2 == 0).all()
    # cat count is a multiple of 12 (12 links per farm page)
    cat = census[census["template"] == "/cat/{n}/{n}"]
    assert (cat["n"] % 12 == 0).all()
