"""Steinhaus three-distance (aggregates.three_distance_int) and
Zeckendorf numeration (aggregates.zeckendorf_int) kernel pins."""

import random

from documentai_ray.stages.aggregates import (ZECK_FIBS,
                                              three_distance_int,
                                              zeckendorf_int)


class TestThreeDistance:
    def test_golden_like_rotation(self):
        # p=7, q=24, n=10: gaps {1,3} — two distances
        out = three_distance_int(7, 24, 10)
        assert out["n_distinct_gaps"].iloc[0] == 2
        assert set(out["gap"]) == {1, 3}
        assert out["gap"].sum() == 24

    def test_three_gap_case_sum_property(self):
        # find any instance with exactly 3 gaps; theorem says
        # largest = sum of the others (asserted in-kernel too)
        rng = random.Random(103)
        found = 0
        for _ in range(200):
            p = rng.randrange(1, 200)
            q = rng.randrange(10, 60)
            n = rng.randrange(2, q)
            out = three_distance_int(p, q, n)
            assert out["n_distinct_gaps"].iloc[0] <= 3
            if out["n_distinct_gaps"].iloc[0] == 3:
                found += 1
                gaps = sorted(set(out["gap"]))
                assert gaps[2] == gaps[0] + gaps[1]
        assert found > 0

    def test_single_point(self):
        out = three_distance_int(5, 24, 1)
        assert len(out) == 1
        assert out["gap"].iloc[0] == 24
        assert out["n_distinct_gaps"].iloc[0] == 1

    def test_full_orbit_equal_gaps(self):
        # n = q-1 missing one point... full orbit n=q gives n%q=0
        # -> fallback n=1; use coprime step with n=q-1: gaps are
        # {1, 2} (one doubled gap where the missing point sits)
        out = three_distance_int(1, 12, 11)
        assert set(out["gap"]) == {1, 2}

    def test_noncoprime_reduction(self):
        # p=12, q=18: gcd=6 -> p1=2, but gcd(2,18)=2 != 1 -> 1
        out = three_distance_int(12, 18, 5)
        assert out["p_reduced"].iloc[0] == 1

    def test_points_distinct_and_sorted(self):
        out = three_distance_int(13, 31, 20)
        pts = list(out["point"])
        assert pts == sorted(pts)
        assert len(set(pts)) == 20


class TestZeckendorf:
    def test_fib_list(self):
        assert ZECK_FIBS[:8] == [1, 2, 3, 5, 8, 13, 21, 34]

    def test_fibonacci_values_are_singletons(self):
        out = zeckendorf_int([1, 2, 3, 5, 8, 13, 21])
        assert (out["n_terms"] == 1).all()
        assert list(out["term"]) == [1, 2, 3, 5, 8, 13, 21]

    def test_classic_100(self):
        out = zeckendorf_int([100])
        assert list(out["term"]) == [89, 8, 3]

    def test_fib_minus_one_alternates(self):
        # F_k - 1 uses every other Fibonacci below: 33 = 21+8+3+1
        out = zeckendorf_int([33])
        assert list(out["term"]) == [21, 8, 3, 1]

    def test_sum_and_nonadjacency_random(self):
        # uniqueness is certified exhaustively in-kernel for
        # v <= 300; check reconstruction + non-adjacency here
        rng = random.Random(107)
        vals = [rng.randrange(1, 300) for _ in range(12)]
        out = zeckendorf_int(vals)
        for inst, grp in out.groupby("inst"):
            assert grp["term"].sum() == grp["value"].iloc[0]
            idxs = sorted(ZECK_FIBS.index(t) for t in grp["term"])
            assert all(b - a >= 2 for a, b in zip(idxs, idxs[1:]))

    def test_large_values(self):
        out = zeckendorf_int([900, 899])
        for inst, grp in out.groupby("inst"):
            assert grp["term"].sum() == grp["value"].iloc[0]
