"""Linear attribution windows, approximate-FD g3 error, OOV rate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _attr(ray_session, rows, window=100):
    import ray.data

    from documentai_ray.stages.windows import attribution_linear

    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "ty": pa.array([r[2] for r in rows], pa.string()),
    })
    out = attribution_linear(
        ray.data.from_arrow(t), key_col="u", ts_col="ts", type_col="ty",
        conversion_type="buy", window=window).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["n_touches", "credit_ppm"])
    return out.set_index("ty").sort_index()


def test_attribution_equal_split_and_floor(ray_session):
    # one buy at t=100, three touches inside the window → 333333 each
    rows = [("a", 10, "view"), ("a", 50, "click"), ("a", 90, "view"),
            ("a", 100, "buy")]
    out = _attr(ray_session, rows)
    assert out.loc["view", "n_touches"] == 2
    assert out.loc["view", "credit_ppm"] == 2 * 333_333
    assert out.loc["click", "credit_ppm"] == 333_333


def test_attribution_window_strictness(ray_session):
    # touch AT the conversion timestamp is excluded (strict right edge);
    # touch exactly window-early is included (closed left edge)
    rows = [("a", 0, "view"), ("a", 100, "click"), ("a", 100, "buy")]
    out = _attr(ray_session, rows, window=100)
    assert "click" not in out.index          # same-ts, excluded
    assert out.loc["view", "credit_ppm"] == 1_000_000


def test_attribution_no_cross_user_leak(ray_session):
    # user b's touch sits inside user a's window but must not credit
    rows = [("b", 95, "view"), ("a", 96, "click"), ("a", 100, "buy")]
    out = _attr(ray_session, rows)
    assert out.loc["click", "credit_ppm"] == 1_000_000
    assert "view" not in out.index


def test_attribution_orphan_conversion_credits_nothing(ray_session):
    rows = [("a", 0, "view"), ("a", 500, "buy")]  # view outside window
    out = _attr(ray_session, rows, window=100)
    assert len(out) == 0 or out["credit_ppm"].sum() == 0


def test_attribution_overlapping_conversions_stack(ray_session):
    # two buys, both windows cover the single view → it earns 2 × 10⁶
    rows = [("a", 50, "view"), ("a", 60, "buy"), ("a", 70, "buy")]
    out = _attr(ray_session, rows)
    assert out.loc["view", "n_touches"] == 2
    assert out.loc["view", "credit_ppm"] == 2_000_000


def test_fd_g3_error_exact(ray_session):
    import ray.data

    from documentai_ray.stages.dq import fd_g3_error

    # a→x:2, a→y:1 (delete 1); b→x:3 (clean) → g3 = 1 of 6
    t = pa.table({"l": pa.array(list("aaabbb")),
                  "r": pa.array(["x", "x", "y", "x", "x", "x"])})
    out = fd_g3_error(ray.data.from_arrow(t), lhs_col="l", rhs_col="r")
    assert out.loc[0, "n"] == 6
    assert out.loc[0, "n_keep"] == 5
    assert out.loc[0, "g3_err"] == 1
    assert out.loc[0, "g3_ppm"] == 1_000_000 // 6


def test_fd_g3_zero_when_fd_holds(ray_session):
    import ray.data

    from documentai_ray.stages.dq import fd_g3_error

    t = pa.table({"l": pa.array(list("aabb")),
                  "r": pa.array(["x", "x", "y", "y"])})
    out = fd_g3_error(ray.data.from_arrow(t), lhs_col="l", rhs_col="r")
    assert out.loc[0, "g3_err"] == 0 and out.loc[0, "g3_ppm"] == 0


def test_oov_rate_membership_and_ppm(ray_session):
    import ray
    import ray.data

    from documentai_ray.stages.textstats import oov_rate

    vocab = np.sort(np.array(["the", "cat", "sat"], dtype="U"))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["the cat sat", "the dog ran fast"])})
    out = (oov_rate(ray.data.from_arrow(t), ray.put(vocab))
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_oov"] == 0 and out.loc[1, "oov_ppm"] == 0
    assert out.loc[2, "n_tokens"] == 4 and out.loc[2, "n_oov"] == 3
    assert out.loc[2, "oov_ppm"] == 3_000_000 // 4


def test_build_vocab_distributed_distinct_sorted(ray_session):
    import ray.data

    from documentai_ray.stages.textstats import build_vocab_distributed

    t = pa.table({"text": pa.array(["b a b", "a c"])})
    v = build_vocab_distributed(ray.data.from_arrow(t))
    assert list(v) == ["a", "b", "c"]
