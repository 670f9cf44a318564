"""Matching-market kernels: Gale-Shapley deferred acceptance and
exhaustive optimal assignment — the 1962 existence and
worker-optimality theorems pinned exhaustively (GS == stable-set
rank-sum argmin on a full seeded sweep), the textbook 2x2 with two
stable matchings, cyclic latin preferences, Monge-matrix diagonal
optimality, and the greedy counterexample."""

from __future__ import annotations

import itertools
import random

from documentai_ray.stages.matching import (
    gale_shapley,
    matching_market_frames,
    optimal_assignment_int,
    stable_set_brute,
)


def _ranks_from_prefs(prefs: list[list[int]]) -> list[list[int]]:
    """prefs[i] = ordered list of partner ids, best first ->
    rank matrix r[i][j] (1 = best)."""
    n = len(prefs)
    r = [[0] * n for _ in range(n)]
    for i, p in enumerate(prefs):
        for rank, j in enumerate(p, 1):
            r[i][j] = rank
    return r


class TestGaleShapley:
    def test_worker_optimal_equals_ranksum_argmin_sweep(self):
        """The cross-engine load-bearing theorem, pinned on a seeded
        sweep of 60 random 4x4 strict preference profiles: the GS
        outcome is stable, and among ALL stable matchings it is the
        unique argmin of the worker rank sum — exactly what the SQL
        mirror selects without running the proposal loop."""
        rng = random.Random(42)
        for _ in range(60):
            wrank = _ranks_from_prefs(
                [rng.sample(range(4), 4) for _ in range(4)])
            trank = _ranks_from_prefs(
                [rng.sample(range(4), 4) for _ in range(4)])
            gs = tuple(gale_shapley(wrank, trank))
            stable = stable_set_brute(wrank, trank)
            assert len(stable) >= 1          # existence (1962)
            assert gs in stable              # GS is stable
            key = lambda p: (sum(wrank[i][p[i]] for i in range(4)), p)
            assert gs == min(stable, key=key)

    def test_textbook_two_stable_matchings(self):
        """W0: t0>t1, W1: t1>t0; T0: w1>w0, T1: w0>w1 — BOTH the
        worker-optimal (each worker gets their first choice) and the
        task-optimal matchings are stable; GS (worker-proposing)
        returns the worker-optimal one."""
        wrank = _ranks_from_prefs([[0, 1], [1, 0]])
        trank = _ranks_from_prefs([[1, 0], [0, 1]])
        stable = stable_set_brute(wrank, trank)
        assert set(stable) == {(0, 1), (1, 0)}
        assert tuple(gale_shapley(wrank, trank)) == (0, 1)

    def test_cyclic_latin_three_stable(self):
        """The classic 3x3 cyclic (latin-square) profile has 3
        stable matchings — the lattice of stable matchings is
        genuinely more than the two extremes."""
        wrank = _ranks_from_prefs([[0, 1, 2], [1, 2, 0], [2, 0, 1]])
        trank = _ranks_from_prefs([[1, 2, 0], [2, 0, 1], [0, 1, 2]])
        stable = stable_set_brute(wrank, trank)
        assert len(stable) == 3
        assert tuple(gale_shapley(wrank, trank)) in stable

    def test_unanimous_preferences_serial_dictatorship(self):
        """All workers share one list and all tasks share one list:
        the unique stable matching pairs by task-side priority."""
        wrank = _ranks_from_prefs([[0, 1, 2]] * 3)
        trank = _ranks_from_prefs([[0, 1, 2]] * 3)
        stable = stable_set_brute(wrank, trank)
        assert stable == [(0, 1, 2)]
        assert tuple(gale_shapley(wrank, trank)) == (0, 1, 2)


class TestOptimalAssignment:
    def test_monge_matrix_identity_optimal(self):
        """Monge cost (c[i][j] = (i-j)^2 is Monge): the identity
        diagonal is the optimal assignment — the classical
        structure theorem."""
        c = [[(i - j) ** 2 for j in range(4)] for i in range(4)]
        perm, tot, _ = optimal_assignment_int(c)
        assert perm == (0, 1, 2, 3) and tot == 0

    def test_greedy_counterexample(self):
        """Row-greedy takes (0,0)=1 then is forced into 100; the
        exhaustive optimum pays 2+2=4 — myopic column-min loses."""
        c = [[1, 2], [2, 100]]
        perm, tot, worst = optimal_assignment_int(c)
        assert perm == (1, 0) and tot == 4
        assert worst == 101

    def test_permutation_cost_recovery(self):
        """Cost = 0 exactly on a planted permutation, 1 elsewhere:
        the optimum recovers the planted permutation at cost 0."""
        planted = (2, 0, 3, 1)
        c = [[0 if planted[i] == j else 1 for j in range(4)]
             for i in range(4)]
        perm, tot, worst = optimal_assignment_int(c)
        assert perm == planted and tot == 0 and worst == 4

    def test_tie_break_lexicographic(self):
        """All-equal costs: every permutation ties; the identity
        (lexicographically first) wins — the SQL ORDER BY total,
        pid contract."""
        c = [[5] * 3 for _ in range(3)]
        perm, tot, _ = optimal_assignment_int(c)
        assert perm == (0, 1, 2) and tot == 15

    def test_n_cap(self):
        import pytest

        with pytest.raises(ValueError):
            optimal_assignment_int([[0] * 7 for _ in range(7)])


class TestMarketFrames:
    def test_frames_shapes_and_rank_bounds(self):
        n_cells = [[5, 1, 2, 3], [1, 6, 2, 2], [3, 3, 9, 1],
                   [2, 2, 2, 8]]
        s_cells = [[10, 40, 30, 20], [40, 10, 20, 30],
                   [20, 30, 10, 40], [30, 20, 40, 10]]
        out = matching_market_frames(list("abcd"), n_cells, s_cells)
        a, s = out["assignment"], out["stable"]
        assert sorted(a["task"]) == [0, 1, 2, 3]
        assert sorted(s["task"]) == [0, 1, 2, 3]
        assert a["total_cost"].nunique() == 1
        assert int(a["total_cost"].iloc[0]) \
            == int(a["cell_cost"].sum())
        assert s["w_rank"].between(1, 4).all()
        assert s["t_rank"].between(1, 4).all()
        assert int(s["n_stable"].iloc[0]) >= 1
