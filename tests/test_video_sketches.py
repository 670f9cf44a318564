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


class TestMisraGries:
    def test_guarantee_on_skewed_stream(self):
        from documentai_ray.stages.sketches import misra_gries

        # zipf-ish: 'hot' is 40% of a 1000-token stream, 200 cold tokens
        stream = (["hot"] * 400
                  + [f"cold{i % 200}" for i in range(600)])
        mg = misra_gries(stream, k=4)
        assert "hot" in mg                       # f > n/(k+1) must survive
        assert len(mg) <= 4
        # counter undercounts by at most n/(k+1)
        assert 400 - 1000 // 5 <= mg["hot"] <= 400

    def test_exact_when_vocab_fits(self):
        from documentai_ray.stages.sketches import misra_gries

        mg = misra_gries(["a", "b", "a", "c", "a"], k=8)
        assert mg == {"a": 3, "b": 1, "c": 1}

    def test_heavy_hitter_pipeline_exact(self, ray_session):
        import collections

        import ray.data

        from documentai_ray.stages.sketches import heavy_hitter_tokens

        rows = [{"text": "hot " * 5 + f"cold{i} rare{i}"} for i in range(300)]
        ds = ray.data.from_items(rows).repartition(8)
        out = heavy_hitter_tokens(ds, k=3).to_pandas()
        true = collections.Counter()
        for r in rows:
            true.update(r["text"].split())
        n = sum(true.values())
        expect = {t: c for t, c in true.items() if c * 4 > n}
        assert dict(zip(out["token"], out["n_count"])) == expect
        assert expect == {"hot": 1500}           # the test is non-vacuous


class TestHyperLogLog:
    def test_rho_edges(self):
        from documentai_ray.stages.sketches import hll_rho

        assert hll_rho(0) == 55              # empty remainder: all 54 bits zero
        assert hll_rho(1) == 54              # ...0001 → leading-zero run 53
        assert hll_rho(1 << 53) == 1         # top bit set
        assert hll_rho((1 << 53) - 1) == 2   # 53 ones: no float-log2 rounding
        assert hll_rho((1 << 52) + 1) == 2

    def test_estimate_within_hll_error(self, ray_session):
        import ray.data

        from documentai_ray.stages.sketches import hll_distinct_shingles

        # 2000 docs of 12 unique tokens each → known distinct 3-shingle count
        rows = [{"text": " ".join(f"w{i}_{j}" for j in range(12))}
                for i in range(2000)]
        true_distinct = 2000 * 10
        ds = ray.data.from_items(rows).repartition(8)
        out = hll_distinct_shingles(ds).to_pandas()
        est = int(out["est_raw"].iloc[0])
        # standard error 1.04/sqrt(1024) ≈ 3.3%; allow 4 sigma
        assert abs(est - true_distinct) < 0.13 * true_distinct
        assert int(out["m"].iloc[0]) == 1024
        assert int(out["n_zero"].iloc[0]) == 0   # 20k >> m: raw regime

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from documentai_ray.stages.sketches import hll_distinct_shingles

        rows = [{"text": f"a{i} b{i} c{i} d{i}"} for i in range(500)]
        outs = []
        for parts in (2, 16):
            ds = ray.data.from_items(rows).repartition(parts)
            outs.append(hll_distinct_shingles(ds).to_pandas())
        assert outs[0].equals(outs[1])       # register max-merge is associative

    def test_small_range_correction(self):
        import numpy as np

        from documentai_ray.stages.sketches import (HLL_M, hll_corrected,
                                                    hll_estimate_raw, hll_rho,
                                                    md5_le64)

        regs = np.zeros(HLL_M, np.int64)
        items = [f"x{i}" for i in range(50)]
        for it in items:
            h = md5_le64(it)
            b = h & (HLL_M - 1)
            regs[b] = max(regs[b], hll_rho(h >> 10))
        corrected = hll_corrected(regs)
        # linear counting is near-exact at 50/1024 load
        assert abs(corrected - 50) <= 2
        _, raw = hll_estimate_raw(regs)
        assert raw <= 5 * HLL_M // 2         # and the raw path chose correction


class TestGroupedKMV:
    def test_exact_below_k_and_estimate_above(self, ray_session):
        import ray.data

        from documentai_ray.stages.sketches import grouped_kmv_distinct

        rows = ([{"k": "small", "v": i % 40} for i in range(500)]
                + [{"k": "big", "v": i} for i in range(3000)])
        ds = ray.data.from_items(rows).repartition(8)
        out = (grouped_kmv_distinct(ds, key_col="k", val_col="v", k=128)
               .to_pandas().set_index("k"))
        assert out.loc["small", "est_distinct"] == 40      # exact below k
        assert out.loc["small", "n_kept"] == 40
        big = out.loc["big", "est_distinct"]
        assert abs(big - 3000) < 0.3 * 3000                # ~1/sqrt(126) err
        assert out.loc["big", "n_kept"] == 128

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from documentai_ray.stages.sketches import grouped_kmv_distinct

        rows = [{"k": chr(97 + i % 2), "v": i * 17} for i in range(1000)]
        outs = []
        for p in (2, 12):
            ds = ray.data.from_items(rows).repartition(p)
            outs.append(grouped_kmv_distinct(ds, key_col="k", val_col="v")
                        .to_pandas().sort_values("k").reset_index(drop=True))
        assert outs[0].equals(outs[1])


class TestCountMin:
    def test_never_underestimates_and_tight_for_heavy(self, ray_session):
        import collections

        import ray.data

        from documentai_ray.stages.sketches import (cm_estimate,
                                                    cm_sketch_tokens)

        rows = [{"text": "hot " * 50 + f"cold{i} cold{i+1}"}
                for i in range(300)]
        ds = ray.data.from_items(rows).repartition(6)
        grid = cm_sketch_tokens(ds)
        true = collections.Counter()
        for r in rows:
            true.update(r["text"].split())
        for tok, n in list(true.items())[:50]:
            est = cm_estimate(grid, tok)
            assert est >= n                        # one-sided guarantee
        n_total = sum(true.values())
        # heavy token estimate within eN (e = e/w ~ 0.27% of 15600)
        assert cm_estimate(grid, "hot") - true["hot"] <= 3 * n_total / 1024

    def test_merge_parallelism_invariant(self, ray_session):
        import numpy as np
        import ray.data

        from documentai_ray.stages.sketches import cm_sketch_tokens

        rows = [{"text": f"a{i % 17} b{i % 5}"} for i in range(500)]
        grids = [cm_sketch_tokens(ray.data.from_items(rows).repartition(p))
                 for p in (2, 11)]
        assert np.array_equal(grids[0], grids[1])


class TestAMSF2:
    def test_unbiased_scale_and_invariance(self, ray_session):
        import numpy as np
        import ray.data

        from documentai_ray.stages.sketches import ams_f2_sketch

        # skewed keys: F2 dominated by the hot key
        rows = ([{"k": "hot"}] * 300
                + [{"k": f"c{i}"} for i in range(200)])
        true_f2 = 300 * 300 + 200
        outs = []
        for p in (3, 13):
            ds = ray.data.from_items(rows).repartition(p)
            outs.append(ams_f2_sketch(ds, key_col="k").to_pandas())
        assert outs[0].equals(outs[1])            # merge-invariant
        est = int(outs[0]["est_f2"].iloc[0])
        # d=8 lower-median is within a small constant factor on skew
        assert true_f2 / 4 <= est <= true_f2 * 4


class TestKmvIntersect:
    def test_exact_regime_equals_true_intersection(self, ray_session):
        from documentai_ray.stages.sketches import kmv_intersect_sets
        a = ray_session.data.from_items([{"v": i} for i in range(20)])
        b = ray_session.data.from_items([{"v": i} for i in range(12, 40)])
        out = kmv_intersect_sets(a, b, val_col="v", k=64).to_pandas()
        r = out.iloc[0]
        # union 40 < k: both sketches exact -> exact answers
        assert r["n_union_kept"] == 40
        assert r["est_union"] == 40
        assert r["common"] == 8 and r["est_intersect"] == 8

    def test_estimate_regime_accuracy_and_merge_invariance(
            self, ray_session):
        from documentai_ray.stages.sketches import kmv_intersect_sets
        n, k = 3000, 128
        a_vals = list(range(n))                    # 0..2999
        b_vals = list(range(n // 2, n + n // 2))   # 1500..4499
        A = ray_session.data.from_items(
            [{"v": v} for v in a_vals]).repartition(7)
        B = ray_session.data.from_items(
            [{"v": v} for v in b_vals]).repartition(3)
        out = kmv_intersect_sets(A, B, val_col="v", k=k).to_pandas().iloc[0]
        # true: union 4500, intersection 1500; KMV rel error ~ 1/sqrt(k)
        assert abs(out["est_union"] - 4500) / 4500 < 0.35
        assert abs(out["est_intersect"] - 1500) / 1500 < 0.5
        # parallelism invariance: different block layout, same sketch
        out2 = kmv_intersect_sets(
            ray_session.data.from_items([{"v": v} for v in a_vals]),
            ray_session.data.from_items([{"v": v} for v in b_vals]),
            val_col="v", k=k).to_pandas().iloc[0]
        assert (out == out2).all()

    def test_disjoint_sets_estimate_zero(self, ray_session):
        from documentai_ray.stages.sketches import kmv_intersect_sets
        a = ray_session.data.from_items([{"v": i} for i in range(500)])
        b = ray_session.data.from_items(
            [{"v": i} for i in range(10_000, 10_500)])
        out = kmv_intersect_sets(a, b, val_col="v", k=32).to_pandas().iloc[0]
        assert out["common"] == 0 and out["est_intersect"] == 0


class TestKmvDifference:
    def test_exact_regime_differences(self, ray_session):
        from documentai_ray.stages.sketches import kmv_difference_sets
        a = ray_session.data.from_items([{"v": i} for i in range(20)])
        b = ray_session.data.from_items([{"v": i} for i in range(12, 40)])
        out = kmv_difference_sets(a, b, val_col="v", k=64).to_pandas()
        r = out.iloc[0]
        # exact: |A\B| = 12 (0..11), |B\A| = 20 (20..39)
        assert r["est_only_a"] == 12 and r["est_only_b"] == 20
        assert r["est_union"] == 40

    def test_estimate_regime_reasonable(self, ray_session):
        from documentai_ray.stages.sketches import kmv_difference_sets
        A = ray_session.data.from_items([{"v": v} for v in range(3000)])
        B = ray_session.data.from_items(
            [{"v": v} for v in range(1500, 4500)])
        r = kmv_difference_sets(A, B, val_col="v",
                                k=128).to_pandas().iloc[0]
        assert abs(r["est_only_a"] - 1500) / 1500 < 0.5
        assert abs(r["est_only_b"] - 1500) / 1500 < 0.5


def test_log2_quantile_sketch_exact_buckets(ray_session):
    """Octave boundaries are exact (powers of two land in their own
    bucket, v=2^k-1 in the one below) and the rank rule is inclusive
    ceil(q*n/100)."""
    import ray.data

    from documentai_ray.stages.sketches import log2_quantile_sketch

    rows = ([{"k": "a", "v": 8}] * 99 + [{"k": "a", "v": 1024}]
            + [{"k": "b", "v": 7}, {"k": "b", "v": 8}])
    out = log2_quantile_sketch(
        ray_session.data.from_items(rows).repartition(4),
        key_col="k", val_col="v", q_pct=99).to_pandas()
    got = {r["k"]: (r["n"], r["q_bucket"], r["q_lo"], r["q_hi"])
           for _, r in out.iterrows()}
    # a: n=100, rank ceil(99) = 99 -> still in bucket 3 ([8,15])
    assert got["a"] == (100, 3, 8, 15)
    # b: n=2, rank ceil(1.98) = 2 -> v=8, bucket 3 (7 is bucket 2)
    assert got["b"] == (2, 3, 8, 15)


def test_log2_quantile_sketch_rejects_nonpositive(ray_session):
    import pytest

    from documentai_ray.stages.sketches import log2_quantile_sketch

    ds = ray_session.data.from_items([{"k": "a", "v": 0}])
    with pytest.raises(Exception):
        log2_quantile_sketch(ds, key_col="k", val_col="v")
    with pytest.raises(ValueError):
        log2_quantile_sketch(ds, key_col="k", val_col="v", q_pct=0)
