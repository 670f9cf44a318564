"""Conversion lag, Q17 decorrelation inequality, relational division."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _events(rows):
    """rows: (user, minute_offset, type)."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(int(r[1] * 60), "s")
                        for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())})


def test_conversion_lag_first_touch_semantics(ray_session):
    import ray.data

    from documentai_ray.stages.windows import conversion_lag

    rows = [
        (1, 0, "signup"), (1, 10, "signup"), (1, 5, "purchase"),
        (1, 7, "purchase"),                       # first purchase after
        (2, 0, "purchase"), (2, 5, "signup"),     # purchase BEFORE signup
        (3, 0, "signup"),                         # never converts
        (4, 3, "signup"), (4, 3, "purchase"),     # simultaneous: strict >
    ]
    out = (conversion_lag(ray.data.from_arrow(_events(rows)),
                          num_partitions=4)
           .to_pandas().set_index("user_id"))
    # user 1: first signup t=0, first purchase after = t=5 → 300 s
    assert out.loc[1, "lag_s"] == 300
    # users 2 (no purchase after signup), 3 (no purchase), 4 (tie not
    # strictly after) emit nothing
    assert set(out.index) == {1}


def test_conversion_lag_cross_user_isolation(ray_session):
    import ray.data

    from documentai_ray.stages.windows import conversion_lag

    rows = [(1, 0, "signup"), (2, 1, "purchase"), (2, 0, "signup"),
            (1, 2, "purchase")]
    out = (conversion_lag(ray.data.from_arrow(_events(rows)),
                          num_partitions=4)
           .to_pandas().set_index("user_id"))
    assert out.loc[1, "lag_s"] == 120
    assert out.loc[2, "lag_s"] == 60


def test_q17_inequality_is_exact():
    # the rewrite q < 0.2·(Σq/n) ⟺ 5·q·n < Σq, checked on the boundary:
    # part with quantities [1, 4] → Σq = 5, n = 2; threshold 0.2·2.5 = 0.5
    # → q = 1: 5·1·2 = 10 >= 5 → excluded (1 > 0.5 indeed)
    assert not (5 * 1 * 2 < 5)
    # part with quantities [1, 9] → Σq = 10, n = 2, thr = 1.0 → q = 1:
    # 5·1·2 = 10 >= 10 → excluded (strict <, 1 is not < 1.0)
    assert not (5 * 1 * 2 < 10)
    # part with quantities [1, 10] → Σq = 11 → 10 < 11 → included
    assert 5 * 1 * 2 < 11


def test_q17_engine_hand_case(ray_session):
    import ray.data

    from documentai_ray import __name__ as _  # noqa: F401
    import __ray_entry__ as entrymod

    # build a tiny lineitem parquet: part 1 has qties [1, 10] (1 is
    # small: 10 < 11), part 2 has [5, 5] (never small)
    import pandas as pd
    import tempfile, os
    df = pd.DataFrame({
        "l_partkey": [1, 1, 2, 2],
        "l_quantity": [1.0, 10.0, 5.0, 5.0],
        "l_extendedprice": [100.0, 2.0, 3.0, 4.0]})
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "lineitem.parquet"))
        out = entrymod._q_q17_decorrelated(d)
    assert out.loc[0, "n_small"] == 1
    assert out.loc[0, "revenue_cents"] == 10000


def test_relational_division_for_all(ray_session):
    import ray.data

    from documentai_ray.stages.joins import relational_division

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3, 3, 3, 3], pa.int64()),
        "v": pa.array(["a", "b", "c", "a", "c", "a", "b", "c", "c"],
                      pa.string())})
    out = relational_division(ray.data.from_arrow(t),
                              key_col="k", div_col="v").to_pandas()
    # divisor set {a,b,c}: key 1 has all three, key 2 misses b,
    # key 3 has all three (duplicate c counts once)
    assert sorted(out["k"]) == [1, 3]


def test_relational_division_single_value_divisor(ray_session):
    import ray.data

    from documentai_ray.stages.joins import relational_division

    t = pa.table({"k": pa.array([7, 8], pa.int64()),
                  "v": pa.array(["x", "x"], pa.string())})
    out = relational_division(ray.data.from_arrow(t),
                              key_col="k", div_col="v").to_pandas()
    assert sorted(out["k"]) == [7, 8]
