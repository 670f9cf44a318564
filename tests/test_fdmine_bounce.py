"""FD discovery and landing-type bounce rate."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_fd_mine_key_holds_and_violations(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    df = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [10, 10, 11, 11],
        "o_orderstatus": ["O", "F", "O", "O"],
        "o_orderpriority": ["P1", "P1", "P2", "P1"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "orders.parquet"))
    out = (entrymod._q_fd_mine(str(tmp_path))
           .set_index(["lhs", "rhs"]))
    key = out.loc[("o_orderkey", "o_orderstatus")]
    assert (key["n_lhs"], key["n_pairs"]) == (4, 4)
    assert key["violations"] == 0 and bool(key["holds"])
    cs = out.loc[("o_custkey", "o_orderstatus")]
    assert (cs["n_lhs"], cs["n_pairs"], cs["violations"]) == (2, 3, 1)
    assert not bool(cs["holds"])
    ps = out.loc[("o_orderpriority", "o_orderstatus")]
    assert ps["violations"] == 1


def test_bounce_rate_landing_types_and_ties(ray_session):
    import ray.data

    from documentai_ray.stages.windows import bounce_rate_int

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # u1 session 1: view→click within 30m (landing view, no bounce)
        (1, t0, "view", 1),
        (1, t0 + pd.Timedelta(minutes=10), "click", 2),
        # u1 session 2: lone error 50m later (bounce, landing error)
        (1, t0 + pd.Timedelta(minutes=60), "error", 3),
        # u2: lone view (bounce)
        (2, t0 + pd.Timedelta(minutes=5), "view", 4),
        # u3: two SIMULTANEOUS events — event_id tiebreak makes click
        # the landing; one 2-event session, no bounce
        (3, t0, "click", 5),
        (3, t0, "view", 6),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "event_id"])
    out = (bounce_rate_int(ray.data.from_pandas(ev), gap_minutes=30)
           .to_pandas().set_index("landing_type"))
    assert (out.loc["view", "n_sessions"],
            out.loc["view", "n_bounced"]) == (2, 1)
    assert out.loc["view", "bounce_ppm"] == 500_000
    assert (out.loc["error", "n_sessions"],
            out.loc["error", "bounce_ppm"]) == (1, 1_000_000)
    assert (out.loc["click", "n_sessions"],
            out.loc["click", "bounce_ppm"]) == (1, 0)
