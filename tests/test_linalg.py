"""Exact 3x3 linear-system kernels: Leontief input-output and
absorbing-chain fundamental matrix — Cramer arithmetic pinned against
hand inverses, the Hawkins-Simon condition, the Neumann-series lower
bound, Leontief's 2-sector worked example, and the gambler's-ruin
closed forms (dyadic — zero floor residue, bit-exact)."""

from __future__ import annotations

import pytest

from documentai_ray.stages.linalg import (
    absorbing_chain_int,
    hawkins_simon,
    leontief_int,
    mat3_adj_dot,
    mat3_cofactor,
    mat3_det,
)

PPM = 1_000_000


class TestMat3:
    def test_det_identity_and_known(self):
        assert mat3_det([[1, 0, 0], [0, 1, 0], [0, 0, 1]]) == 1
        # |1 2 3; 4 5 6; 7 8 10| = -3
        assert mat3_det([[1, 2, 3], [4, 5, 6], [7, 8, 10]]) == -3

    def test_adj_dot_is_det_times_inverse(self):
        """M . (adj(M) . v) = det(M) . v — the adjugate identity,
        checked on an invertible integer matrix."""
        m = [[2, 1, 0], [1, 3, 1], [0, 1, 2]]
        det = mat3_det(m)
        v = [5, -7, 11]
        x = mat3_adj_dot(m, v)
        for i in range(3):
            assert sum(m[i][j] * x[j] for j in range(3)) == det * v[i]

    def test_cofactor_signs(self):
        m = [[1, 2, 3], [4, 5, 6], [7, 8, 10]]
        assert mat3_cofactor(m, 0, 0) == 5 * 10 - 6 * 8
        assert mat3_cofactor(m, 0, 1) == -(4 * 10 - 6 * 7)


class TestLeontief:
    def test_zero_technology_output_equals_demand(self):
        """A = 0: no intermediate inputs, gross output == demand
        exactly (1000 milli per unit)."""
        out = leontief_int([[0] * 3 for _ in range(3)], list("abc"))
        assert out["gross_output_milli"].tolist() == [1000] * 3
        assert bool(out["hs_ok"].iloc[0])

    def test_diagonal_geometric_series(self):
        """a_ii = 0.2: x_i = 1/(1-0.2) = 1.25 units = 1250 milli —
        the scalar Neumann series, exact (1/0.8 terminates)."""
        a = [[200_000 if i == j else 0 for j in range(3)]
             for i in range(3)]
        out = leontief_int(a, list("abc"))
        assert out["gross_output_milli"].tolist() == [1250] * 3

    def test_leontief_two_sector_worked_example(self):
        """The classic 2-sector example (embedded in 3x3 with an
        isolated third sector): A = [[0.2, 0.3], [0.4, 0.1]],
        d = (1, 1).  (I-A)^-1 d = (2.0, 2.0) exactly — check:
        x - Ax = (2 - .4 - .6, 2 - .8 - .2) = (1, 1)."""
        a = [[200_000, 300_000, 0],
             [400_000, 100_000, 0],
             [0, 0, 0]]
        out = leontief_int(a, list("abc"))
        assert out["gross_output_milli"].tolist() == [2000, 2000,
                                                      1000]

    def test_neumann_lower_bound_and_gross_ge_demand(self):
        """x >= d + A.d term of the Neumann series; in particular
        gross >= demand whenever Hawkins-Simon holds."""
        a = [[100_000, 50_000, 0], [200_000, 0, 100_000],
             [0, 300_000, 50_000]]
        out = leontief_int(a, list("abc"))
        assert bool(out["hs_ok"].iloc[0])
        first_order = [1000 + sum(a[i][j] for j in range(3)) // 1000
                       for i in range(3)]
        got = out["gross_output_milli"].tolist()
        assert all(g >= f for g, f in zip(got, first_order))
        assert all(g >= 1000 for g in got)

    def test_unproductive_economy_raises(self):
        a = [[PPM, 0, 0], [0, 0, 0], [0, 0, 0]]  # a_00 = 1.0
        with pytest.raises(ValueError):
            leontief_int(a, list("abc"))

    def test_hawkins_simon_detects_bad_minor(self):
        m = [[-1, 0, 0], [0, 1, 0], [0, 0, 1]]
        assert not hawkins_simon(m)


class TestAbsorbingChain:
    def test_q_zero_one_step_and_b_equals_r(self):
        """Q = 0: absorbed after exactly one step (1000 milli), and
        the absorption split is R itself."""
        r = [[700_000, 300_000], [500_000, 500_000],
             [100_000, 900_000]]
        out = absorbing_chain_int([[0] * 3 for _ in range(3)], r,
                                  list("abc"), ["p", "s"])
        assert out["steps_milli"].tolist() == [1000] * 3
        assert out["absorb_p_ppm"].tolist() == [700_000, 500_000,
                                                100_000]
        assert out["absorb_s_ppm"].tolist() == [300_000, 500_000,
                                                900_000]

    def test_gamblers_ruin_closed_forms_exact(self):
        """Symmetric walk on {0..4} absorbing at both ends,
        transient {1,2,3}: expected steps from i = i(4-i) and
        P(absorb right) = i/4 — dyadic, so the floored ppm
        arithmetic lands the textbook numbers EXACTLY."""
        h = PPM // 2
        q = [[0, h, 0], [h, 0, h], [0, h, 0]]
        r = [[h, 0], [0, 0], [0, h]]  # left from 1, right from 3
        out = absorbing_chain_int(q, r, ["s1", "s2", "s3"],
                                  ["left", "right"])
        assert out["steps_milli"].tolist() == [3000, 4000, 3000]
        assert out["absorb_right_ppm"].tolist() == [250_000,
                                                    500_000,
                                                    750_000]
        assert out["absorb_left_ppm"].tolist() == [750_000,
                                                   500_000,
                                                   250_000]

    def test_absorb_split_bounded(self):
        """b_left + b_right <= 1e6 always (floor shave + leaked
        mass only ever lose ppm, never invent them)."""
        q = [[100_000, 200_000, 50_000],
             [300_000, 100_000, 100_000],
             [0, 400_000, 100_000]]
        r = [[300_000, 300_000], [250_000, 250_000],
             [250_000, 250_000]]
        out = absorbing_chain_int(q, r, list("abc"), ["p", "s"])
        tot = out["absorb_p_ppm"] + out["absorb_s_ppm"]
        assert (tot <= PPM).all()
        assert (out["steps_milli"] >= 1000).all()

    def test_non_absorbing_raises(self):
        q = [[PPM, 0, 0], [0, PPM, 0], [0, 0, PPM]]
        with pytest.raises(ValueError):
            absorbing_chain_int(q, [[0, 0]] * 3, list("abc"),
                                ["p", "s"])
