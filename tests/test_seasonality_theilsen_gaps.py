"""Seasonality eta², Theil–Sen slope, inter-arrival gap stats."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hourly_events(spec, key="k"):
    """spec: list of (day, hour, count) → events table."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts, ks = [], []
    for day, hour, count in spec:
        t = base + np.timedelta64(day, "D") + np.timedelta64(hour, "h")
        for _ in range(count):
            ts.append(t)
            ks.append(key)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array(ks, pa.string())})


def test_seasonality_pure_signal_is_one(ray_session):
    import ray.data

    from documentai_ray.stages.windows import seasonality_strength_int

    # all volume always at hour 9, 3 days → within-group variance 0
    spec = [(d, 9, 4) for d in range(3)]
    out = seasonality_strength_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    row = out.loc["k"]
    assert row["days"] == 3
    assert row["eta2_ppm"] == 1_000_000
    assert row["peak_hour"] == 9 and row["peak_share_ppm"] == 1_000_000
    assert row["trough_hour"] == 0          # smallest-h tie among zeros


def test_seasonality_hand_case(ray_session):
    import ray.data

    from documentai_ray.stages.windows import seasonality_strength_int

    # 2 days: hour 0 → counts 2 and 4; hour 1 → count 6 on day 0 only
    spec = [(0, 0, 2), (1, 0, 4), (0, 1, 6)]
    out = seasonality_strength_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    row = out.loc["k"]
    s, sc2, d = 12, 4 + 16 + 36, 2
    sh2 = 6 * 6 + 6 * 6                       # S_0 = 6, S_1 = 6
    num = 24 * sh2 - s * s
    den = 24 * d * sc2 - s * s
    assert row["eta2_ppm"] == 1_000_000 * num // den
    assert row["peak_hour"] == 0              # tie S_0 = S_1 → smallest h


def test_theil_sen_exact_line_and_outlier_immunity(ray_session):
    import ray.data

    from documentai_ray.stages.windows import theil_sen_int

    # counts 1,2,3,4 in consecutive hours → every slope = 1000 milli
    spec = [(0, h, h + 1) for h in range(4)]
    out = theil_sen_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    assert out.loc["k", "slope_med_x2_milli"] == 2 * 1000
    assert out.loc["k", "n_pairs"] == 6

    # one wild outlier hour barely moves the median (OLS would chase it)
    spec2 = [(0, 0, 1), (0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 500)]
    out2 = theil_sen_int(
        ray.data.from_arrow(_hourly_events(spec2))).set_index("event_type")
    # pairs: 6 clean slopes of 1000 + 4 huge ones → median still 1000
    assert out2.loc["k", "slope_med_x2_milli"] == 2 * 1000


def test_theil_sen_gap_stretches_dx(ray_session):
    import ray.data

    from documentai_ray.stages.windows import theil_sen_int

    # counts 1 then 4, three hours apart → slope = 3/3 h... dy=3, dx=3
    spec = [(0, 0, 1), (0, 3, 4)]
    out = theil_sen_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    assert out.loc["k", "slope_med_x2_milli"] == 2 * 1000


def test_interarrival_hand_case_and_ties(ray_session):
    import ray.data

    from documentai_ray.stages.windows import interarrival_stats

    base = np.datetime64("2024-03-01T00:00:00", "us")
    offs = [0, 10, 10, 40]                    # gaps: 10, 0, 30
    t = pa.table({
        "ts": pa.array([base + np.timedelta64(o, "s") for o in offs],
                       pa.timestamp("us")),
        "event_type": pa.array(["a"] * 4, pa.string()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = (interarrival_stats(ray.data.from_arrow(t))
           .set_index("event_type"))
    row = out.loc["a"]
    assert row["n_gaps"] == 3
    assert row["min_gap_s"] == 0 and row["max_gap_s"] == 30
    assert row["med_gap_x2_s"] == 20          # median 10 → doubled


def test_interarrival_even_count_median_is_sum_of_middles(ray_session):
    import ray.data

    from documentai_ray.stages.windows import interarrival_stats

    base = np.datetime64("2024-03-01T00:00:00", "us")
    offs = [0, 1, 4, 10, 100]                 # gaps: 1, 3, 6, 90
    t = pa.table({
        "ts": pa.array([base + np.timedelta64(o, "s") for o in offs],
                       pa.timestamp("us")),
        "event_type": pa.array(["a"] * 5, pa.string()),
        "event_id": pa.array(list(range(5)), pa.int64()),
    })
    out = (interarrival_stats(ray.data.from_arrow(t))
           .set_index("event_type"))
    assert out.loc["a", "med_gap_x2_s"] == 3 + 6
