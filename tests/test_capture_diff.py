"""Earliest-vs-latest capture line diff."""

from __future__ import annotations

import pandas as pd


def test_capture_diff_line_sets(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import capture_line_diff

    rows = [
        # u1: early {a, b} → late {b, c, d}: added 2, removed 1,
        # common 1, union 4
        ("u1", pd.Timestamp("2024-01-01"), "a\nb"),
        ("u1", pd.Timestamp("2024-01-02"), "b\nc\nd"),
        # u2: single capture → no row
        ("u2", pd.Timestamp("2024-01-01"), "x"),
        # u3: identical captures → change 0
        ("u3", pd.Timestamp("2024-01-01"), "same\nlines"),
        ("u3", pd.Timestamp("2024-01-03"), "same\nlines"),
        # u4: three captures — only earliest vs latest compared
        ("u4", pd.Timestamp("2024-01-01"), "v1"),
        ("u4", pd.Timestamp("2024-01-02"), "completely different"),
        ("u4", pd.Timestamp("2024-01-03"), "v1"),
    ]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    out = (capture_line_diff(ray.data.from_pandas(df),
                             num_partitions=8)
           .to_pandas().set_index("url"))
    assert set(out.index) == {"u1", "u3", "u4"}
    assert (out.loc["u1", "n_added"], out.loc["u1", "n_removed"],
            out.loc["u1", "n_common"]) == (2, 1, 1)
    assert out.loc["u1", "change_ppm"] == 1_000_000 * 3 // 4
    assert out.loc["u3", "change_ppm"] == 0
    # middle capture invisible: v1 → v1 reads as unchanged
    assert out.loc["u4", "change_ppm"] == 0


def test_capture_diff_on_planted_corpus(ray_session):
    import __ray_entry__ as entrymod

    out = (entrymod._q_capture_diff("/root/testdata/sf0.001")
           .to_pandas())
    # every multi-captured url is a doc_id % 20 == 0 planted stale
    # blank: normal docs read as one line added + the blank removed
    assert len(out) == 25
    normal = out[out["n_added"] > 0]
    assert (normal["n_removed"] == 1).all()
    assert (normal["change_ppm"] == 1_000_000).all()
    # doc 0 (%97 == 0) is blank in BOTH captures → a zero-change row
    zero = out[out["n_added"] == 0]
    assert len(zero) == 1 and (zero["change_ppm"] == 0).all()
