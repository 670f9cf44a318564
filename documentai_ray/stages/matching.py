"""Matching-market kernels — two-sided stable matching (Gale &
Shapley 1962) and min-cost optimal assignment (the transferable-
utility sibling).  Both run on a tiny census (a handful of workers x
tasks), so everything here is exact driver arithmetic on integers;
the distributed part of the family is the ONE bounded cell-census
exchange the queries share.

The theorem load-bearing for the cross-engine mirror: the
worker-proposing Gale-Shapley outcome is the WORKER-OPTIMAL stable
matching — every worker does at least as well in it as in ANY stable
matching — so it is the unique stable matching minimizing the sum of
worker ranks, and a SQL mirror can select it by brute-force
enumeration + rank-sum argmin without implementing the proposal loop.
That equivalence is pinned exhaustively in tests.
"""

from __future__ import annotations

import itertools

import pandas as pd


def optimal_assignment_int(cost: list[list[int]]) -> tuple:
    """Exact min-cost assignment by exhaustive permutation search
    (n <= 6 guard — n! explodes; the census side keeps n tiny).
    Returns (best_perm, best_total, worst_total); ties between
    permutations break lexicographically on the permutation tuple,
    matching a SQL ORDER BY total, base-n-encoded pid."""
    n = len(cost)
    if n > 6:
        raise ValueError("exhaustive assignment capped at n=6")
    best, best_tot, worst_tot = None, None, None
    for perm in itertools.permutations(range(n)):
        tot = sum(cost[i][perm[i]] for i in range(n))
        if best_tot is None or tot < best_tot:
            best, best_tot = perm, tot
        if worst_tot is None or tot > worst_tot:
            worst_tot = tot
    return best, best_tot, worst_tot


def gale_shapley(wrank: list[list[int]],
                 trank: list[list[int]]) -> list[int]:
    """Worker-proposing deferred acceptance.  ``wrank[i][j]`` =
    rank (1 = best) of task j in worker i's strict list, ``trank[j]
    [i]`` likewise for tasks over workers.  Returns match[i] = task
    of worker i.  Terminates in <= n^2 proposals (each worker walks
    down a finite list) and yields the worker-optimal stable
    matching — both classical 1962 theorems, pinned in tests."""
    n = len(wrank)
    # worker i's task ids in preference order
    pref = [sorted(range(n), key=lambda j: wrank[i][j])
            for i in range(n)]
    next_prop = [0] * n
    task_of = [-1] * n
    worker_of = [-1] * n
    free = list(range(n))
    while free:
        w = free.pop()
        j = pref[w][next_prop[w]]
        next_prop[w] += 1
        cur = worker_of[j]
        if cur == -1:
            worker_of[j], task_of[w] = w, j
        elif trank[j][w] < trank[j][cur]:
            worker_of[j], task_of[w] = w, j
            task_of[cur] = -1
            free.append(cur)
        else:
            free.append(w)
    return task_of


def stable_set_brute(wrank: list[list[int]],
                     trank: list[list[int]]) -> list[tuple]:
    """All stable matchings by enumeration: perm sigma is stable iff
    no pair (w, t) with t != sigma(w) where both strictly prefer
    each other to their assigned partners."""
    n = len(wrank)
    out = []
    for perm in itertools.permutations(range(n)):
        inv = [0] * n
        for i, j in enumerate(perm):
            inv[j] = i
        blocked = any(
            wrank[w][t] < wrank[w][perm[w]]
            and trank[t][w] < trank[t][inv[t]]
            for w in range(n) for t in range(n) if perm[w] != t)
        if not blocked:
            out.append(perm)
    return out


def matching_market_frames(workers: list[str], n_cells: list[list[int]],
                           s_cells: list[list[int]]) -> dict:
    """Build both query outputs from the shared (count, cents) cell
    census.  Workers rank tasks by cell COUNT desc (ties: task id
    asc); tasks rank workers by cell CENTS desc (ties: worker id
    asc) — two different metrics so the two sides genuinely
    disagree.  Returns {'assignment': df, 'stable': df}."""
    n = len(workers)
    wrank = [[0] * n for _ in range(n)]
    for i in range(n):
        order = sorted(range(n), key=lambda j: (-n_cells[i][j], j))
        for r, j in enumerate(order, 1):
            wrank[i][j] = r
    trank = [[0] * n for _ in range(n)]
    for j in range(n):
        order = sorted(range(n), key=lambda i: (-s_cells[i][j], i))
        for r, i in enumerate(order, 1):
            trank[j][i] = r

    perm, tot, worst = optimal_assignment_int(s_cells)
    assign = pd.DataFrame({
        "worker": workers,
        "task": [perm[i] for i in range(n)],
        "cell_cost": [s_cells[i][perm[i]] for i in range(n)],
        "total_cost": tot, "worst_total": worst})

    gs = gale_shapley(wrank, trank)
    n_stable = len(stable_set_brute(wrank, trank))
    stable = pd.DataFrame({
        "worker": workers,
        "task": gs,
        "w_rank": [wrank[i][gs[i]] for i in range(n)],
        "t_rank": [trank[gs[i]][i] for i in range(n)],
        "n_stable": n_stable})
    for df in (assign, stable):
        for c in df.columns:
            if c != "worker":
                df[c] = df[c].astype("int64")
    return {"assignment": assign, "stable": stable}
