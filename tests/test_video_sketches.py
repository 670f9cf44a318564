"""MPNG video frame sampling + KMV distinct sketch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_mpng_roundtrip_and_step():
    from documentai_ray.functions.minivideo import (encode_frames, frame_count,
                                                    iter_frames, is_mpng)

    frames = [np.full((8, 8), v, np.uint8) for v in (10, 20, 30, 40, 50)]
    payload = encode_frames(frames)
    assert is_mpng(payload)
    assert frame_count(payload) == 5
    got = list(iter_frames(payload, step=2))
    assert [i for i, _ in got] == [0, 2, 4]
    assert all((f == v).all() for (_, f), v in zip(got, (10, 30, 50)))


def test_video_frame_sample_stage():
    from documentai_ray.functions.minivideo import encode_frames
    from documentai_ray.stages.multimodal import VideoFrameSampleStage

    frames = [np.full((4, 4), v, np.uint8) for v in (0, 255, 100)]
    batch = pa.table({"doc_id": pa.array([9], pa.int64()),
                      "payload": pa.array([encode_frames(frames)],
                                          pa.large_binary())})
    out = VideoFrameSampleStage(step=2)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 2]
    assert out.column("n_frames").to_pylist() == [3, 3]
    # brightness_ppm = g*1e6 // 255 for constant-g frames
    assert out.column("brightness_ppm").to_pylist() == [0, 100 * 1_000_000 // 255]


def test_kmv_exact_below_k():
    from documentai_ray.stages.sketches import kmv_estimate

    h = np.array([5, 1, 9, 1, 5], np.uint64)
    n, est = kmv_estimate(h, k=128)
    assert (n, est) == (3, 3)


def test_kmv_estimate_accuracy():
    from documentai_ray.stages.sketches import kmv_estimate

    rng = np.random.RandomState(3)
    true_n = 20_000
    h = rng.randint(0, 1 << 63, size=true_n, dtype=np.int64).astype(np.uint64) * 2
    k = 256
    _, est = kmv_estimate(h, k=k)
    # relative error ~1/sqrt(k-2) ≈ 6%; allow 4 sigma
    assert abs(est - len(np.unique(h))) / true_n < 0.25


def test_kmv_distinct_shingles_ds(ray_session):
    import ray.data

    from documentai_ray.stages.sketches import kmv_distinct_shingles

    t = pa.table({"text": pa.array(
        ["a b c d", "b c d e", "a b c d"], pa.large_string())})
    # distinct 3-shingles: {a b c, b c d, c d e} -> 3 distinct
    out = kmv_distinct_shingles(ray.data.from_arrow(t), k=16)
    assert out.column("n_kept").to_pylist() == [3]
    assert out.column("est_distinct").to_pylist() == [3]
