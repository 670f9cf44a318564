"""Binary-segmentation changepoint, bloom semi-join, n-gram novelty."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(counts_per_hour, key="k"):
    """Build an events table with counts_per_hour[i] rows in hour i."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts, ks = [], []
    for i, c in enumerate(counts_per_hour):
        for _ in range(c):
            ts.append(base + np.timedelta64(i, "h"))
            ks.append(key)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array(ks, pa.string())})


def _cp(ray_session, counts):
    import ray.data

    from documentai_ray.stages.windows import changepoint_binary_int

    return changepoint_binary_int(
        ray.data.from_arrow(_events(counts))).set_index("event_type")


def test_changepoint_finds_obvious_shift(ray_session):
    # level 2 for 4 hours then level 10 for 4 hours → split after idx 4
    out = _cp(ray_session, [2, 2, 2, 2, 10, 10, 10, 10]).loc["k"]
    assert out["split_idx"] == 4
    assert out["mean_l_milli"] == 2000
    assert out["mean_r_milli"] == 10000
    # split_hour_s = first right-segment hour = 2024-01-01T04
    base = np.datetime64("2024-01-01T04:00:00").astype("datetime64[s]")
    assert out["split_hour_s"] == base.astype("int64")


def test_changepoint_flat_series_ties_to_smallest_t(ray_session):
    # constant series: B(t) = S²/T for every t → all scores equal
    # (up to the milli floor) → argmax picks t = 1
    out = _cp(ray_session, [5, 5, 5, 5]).loc["k"]
    assert out["split_idx"] == 1


def test_changepoint_brute_force_match(ray_session):
    counts = [3, 7, 2, 9, 9, 8, 1, 4]
    out = _cp(ray_session, counts).loc["k"]
    tt, stot = len(counts), sum(counts)
    best = max(
        (1000 * (sum(counts[:t])**2 * (tt - t)
                 + (stot - sum(counts[:t]))**2 * t) // (t * (tt - t)), -t)
        for t in range(1, tt))
    assert out["score_milli"] == best[0] and out["split_idx"] == -best[1]


def test_changepoint_single_hour_raises(ray_session):
    import pytest

    with pytest.raises(Exception):
        _cp(ray_session, [5])


def test_bloom_no_false_negatives_and_fp_measured(ray_session):
    import ray
    import ray.data

    from documentai_ray.stages.sketches import (bloom_build_bits,
                                                bloom_positions,
                                                bloom_semijoin_stats)

    small = pa.table({"k": pa.array(list(range(0, 50)), pa.int64())})
    fact = pa.table({"k": pa.array(list(range(0, 200)) * 3, pa.int64())})
    # tiny filter (m=64) forces collisions → nonzero fp
    bits = bloom_build_bits(ray.data.from_arrow(small), key_col="k",
                            m=64, kh=3)
    truth = np.arange(0, 50, dtype="int64")
    out = bloom_semijoin_stats(
        ray.data.from_arrow(fact), key_col="k",
        bits_ref=ray.put(bits), truth_ref=ray.put(truth), m=64, kh=3)
    row = out.iloc[0]
    assert row["n_fact"] == 600 and row["n_true"] == 150
    assert row["n_candidates"] >= row["n_true"]   # no false negatives
    assert row["n_fp"] > 0                        # m=64 must collide
    assert row["fp_ppm"] == row["n_fp"] * 1_000_000 // 450
    # membership positions are deterministic and in range
    assert all(0 <= p < 64 for p in bloom_positions("42", 64, 3))


def test_ngram_novelty_first_occurrence_semantics(ray_session):
    import ray.data

    from documentai_ray.stages.textstats import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d",          # shingles: abc, bcd — both novel
            "a b c d",          # exact dup — nothing novel
            "a b c x y z",      # abc dup; bcx, cxy, xyz novel → 3/4
            "hi",               # <3 tokens → no shingles
        ])})
    out = (ngram_novelty(ray.data.from_arrow(t), n=3)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "n_ngrams"] == 2 and out.loc[1, "n_novel"] == 2
    assert out.loc[1, "novelty_ppm"] == 1_000_000
    assert out.loc[2, "n_novel"] == 0 and out.loc[2, "novelty_ppm"] == 0
    assert out.loc[3, "n_ngrams"] == 4 and out.loc[3, "n_novel"] == 3
    assert out.loc[3, "novelty_ppm"] == 750_000
    assert out.loc[4, "n_ngrams"] == 0 and out.loc[4, "novelty_ppm"] == 0


def test_ngram_novelty_within_doc_repeat_counts_once(ray_session):
    import ray.data

    from documentai_ray.stages.textstats import ngram_novelty

    # "a b c a b c a b c" → distinct shingles {abc, bca, cab} → 3
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["a b c a b c a b c"])})
    out = ngram_novelty(ray.data.from_arrow(t), n=3).to_pandas()
    assert out.loc[0, "n_ngrams"] == 3 and out.loc[0, "n_novel"] == 3
