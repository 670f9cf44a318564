"""ACF at fixed lags, Wald–Wolfowitz runs test, a-priori triples."""

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


def _acf_ref(x, k):
    """Reference: integer-exact trunc-toward-zero ppm ACF."""
    n = len(x)
    s = sum(x)
    y = [n * v - s for v in x]
    den = sum(v * v for v in y)
    num = sum(a * b for a, b in zip(y[:-k], y[k:]))
    return (1_000_000 * num // den if num >= 0
            else -((1_000_000 * -num) // den))


def test_acf_alternating_series_is_minus_one(ray_session):
    import ray.data

    from documentai_ray.stages.windows import acf_lag_int

    # 6,0,6,0,... — the grid spans OBSERVED hours (0..8 → 9 slots, the
    # trailing zero hour never enters the span): lag-1 anticorrelated,
    # lag-2 correlated
    spec = [(h, 6) for h in range(0, 10, 2)]
    out = acf_lag_int(ray.data.from_arrow(_hourly_events(spec)),
                      lags=(1, 2)).set_index("event_type")
    row = out.loc["k"]
    assert row["n_obs"] == 9
    x = [6, 0] * 4 + [6]
    assert row["acf1_ppm"] == _acf_ref(x, 1)
    assert row["acf2_ppm"] == _acf_ref(x, 2)
    assert row["acf1_ppm"] < -800_000          # strongly negative
    assert row["acf2_ppm"] > 700_000           # strongly positive


def test_acf_hand_case_and_trunc_toward_zero(ray_session):
    import ray.data

    from documentai_ray.stages.windows import acf_lag_int

    # x = [2, 7, 1, 8, 2] → exact hand fold; lag-1 numerator −875 over
    # den 1050 → −833333.33…, where trunc (−833333) ≠ floor (−833334)
    x = [2, 7, 1, 8, 2]
    spec = [(h, v) for h, v in enumerate(x) if v]
    out = acf_lag_int(ray.data.from_arrow(_hourly_events(spec)),
                      lags=(1, 2)).set_index("event_type")
    row = out.loc["k"]
    assert row["acf1_ppm"] == _acf_ref(x, 1)
    assert row["acf2_ppm"] == _acf_ref(x, 2)
    # the lag-1 numerator is negative here: trunc toward zero, not floor
    n = len(x)
    s = sum(x)
    y = [n * v - s for v in x]
    num = sum(a * b for a, b in zip(y[:-1], y[1:]))
    den = sum(v * v for v in y)
    assert num < 0
    assert row["acf1_ppm"] == -((1_000_000 * -num) // den)
    assert row["acf1_ppm"] != (1_000_000 * num) // den  # floor differs


def test_acf_constant_series_raises(ray_session):
    import ray.data

    from documentai_ray.stages.windows import acf_lag_int

    spec = [(h, 2) for h in range(6)]
    with pytest.raises(ValueError, match="constant series"):
        acf_lag_int(ray.data.from_arrow(_hourly_events(spec)), lags=(1,))


def test_acf_lag_bounds_raise(ray_session):
    import ray.data

    from documentai_ray.stages.windows import acf_lag_int

    spec = [(0, 1), (1, 2)]
    with pytest.raises(ValueError, match="outside series"):
        acf_lag_int(ray.data.from_arrow(_hourly_events(spec)), lags=(5,))


def test_runs_alternating_vs_blocked(ray_session):
    import ray.data

    from documentai_ray.stages.windows import runs_test_int

    # blocked: 5 high hours then 5 zero hours → exactly 2 runs
    spec = [(h, 7) for h in range(5)]
    spec.append((9, 1))  # hour 9 nonzero? no — keep zeros: use count 7 at 0-4
    spec = [(h, 7) for h in range(5)] + [(9, 7)]
    # hours 0-4 and 9 are 7; hours 5-8 are 0 → median over
    # [7,7,7,7,7,0,0,0,0,7]: sorted [0,0,0,0,7,7,7,7,7,7] → med2 = 14?
    # even n: middles are 7 and 7 → med2 = 14 → ties at median drop the
    # high values! pick asymmetric counts instead.
    spec = [(h, 9) for h in range(5)] + [(h, 1) for h in range(5, 10)]
    out = runs_test_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    row = out.loc["k"]
    # dense series [9×5, 1×5]: med2 = 1+9 = 10; no ties at median
    assert row["med_x2"] == 10
    assert row["n_above"] == 5 and row["n_below"] == 5
    assert row["n_runs"] == 2                 # one block each side
    # E[R] = 1 + 2·25/10 = 6 → 6e6 ppm; 2 << 6 → clustered
    assert row["exp_runs_ppm"] == 6_000_000
    assert row["clustered"] == 1


def test_runs_alternating_is_not_clustered(ray_session):
    import ray.data

    from documentai_ray.stages.windows import runs_test_int

    # 9,1,9,1,... alternating over 10 hours → 10 runs > E[R] = 6
    spec = [(h, 9 if h % 2 == 0 else 1) for h in range(10)]
    out = runs_test_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    row = out.loc["k"]
    assert row["n_runs"] == 10
    assert row["clustered"] == 0


def test_runs_median_ties_drop(ray_session):
    import ray.data

    from documentai_ray.stages.windows import runs_test_int

    # [5,5,5,9,1]: sorted [1,5,5,5,9], med2 = 10 → the three 5s tie
    # and DROP; kept = [9,1] → 2 runs, n1 = n2 = 1
    spec = [(0, 5), (1, 5), (2, 5), (3, 9), (4, 1)]
    out = runs_test_int(
        ray.data.from_arrow(_hourly_events(spec))).set_index("event_type")
    row = out.loc["k"]
    assert row["med_x2"] == 10
    assert row["n_above"] == 1 and row["n_below"] == 1
    assert row["n_runs"] == 2
    # E[R] = 1 + 2·1·1/2 = 2 = R → not clustered (strict <)
    assert row["exp_runs_ppm"] == 2_000_000
    assert row["clustered"] == 0


def test_runs_all_ties_raise(ray_session):
    import ray.data

    from documentai_ray.stages.windows import runs_test_int

    spec = [(h, 3) for h in range(4)]
    with pytest.raises(ValueError, match="ties the median"):
        runs_test_int(ray.data.from_arrow(_hourly_events(spec)))


def _baskets(rows):
    return pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())})


def test_frequent_triples_hand_case(ray_session):
    import ray.data

    from documentai_ray.stages.graph import frequent_triples

    # baskets: {1,2,3,4} ×2 and {1,2,3} once more → triple (1,2,3)
    # has support 3; (1,2,4),(1,3,4),(2,3,4) support 2; all kept
    rows = ([(10, i) for i in (1, 2, 3, 4)]
            + [(20, i) for i in (1, 2, 3, 4)]
            + [(30, i) for i in (1, 2, 3)])
    out = (frequent_triples(ray.data.from_arrow(_baskets(rows)),
                            basket_col="l_orderkey", item_col="l_partkey",
                            min_support=2, num_partitions=4)
           .to_pandas().sort_values(["item_a", "item_b", "item_c"])
           .reset_index(drop=True))
    got = [tuple(r) for r in out.to_numpy()]
    assert got == [(1, 2, 3, 3), (1, 2, 4, 2), (1, 3, 4, 2), (2, 3, 4, 2)]


def test_frequent_triples_apriori_prune_and_dupes(ray_session):
    import ray.data

    from documentai_ray.stages.graph import frequent_triples

    # item 9 appears in ONE basket only → pruned before combinations;
    # duplicate (basket, item) rows count once
    rows = ([(10, i) for i in (1, 2, 3, 9)] + [(10, 1)]      # dupe
            + [(20, i) for i in (1, 2, 3)])
    out = (frequent_triples(ray.data.from_arrow(_baskets(rows)),
                            basket_col="l_orderkey", item_col="l_partkey",
                            min_support=2, num_partitions=4)
           .to_pandas())
    got = [tuple(r) for r in out.to_numpy()]
    assert got == [(1, 2, 3, 2)]


def test_frequent_triples_no_survivors_is_empty(ray_session):
    import ray.data

    from documentai_ray.stages.graph import frequent_triples

    rows = [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5), (20, 6)]
    out = frequent_triples(ray.data.from_arrow(_baskets(rows)),
                           basket_col="l_orderkey", item_col="l_partkey",
                           min_support=2, num_partitions=4).to_pandas()
    assert len(out) == 0


def test_frequent_triples_max_basket_raises(ray_session):
    import ray.data

    from documentai_ray.stages.graph import frequent_triples

    rows = [(10, i) for i in range(6)] + [(20, i) for i in range(6)]
    with pytest.raises(Exception, match="max_basket"):
        frequent_triples(ray.data.from_arrow(_baskets(rows)),
                         basket_col="l_orderkey", item_col="l_partkey",
                         min_support=2, num_partitions=2,
                         max_basket=5).to_pandas()
