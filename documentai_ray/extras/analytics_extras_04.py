"""Analytics/math kernels (part 4/4) — split out of ``stages/aggregates.py`` (VERDICT r2 #5). Chain link: star-imports the previous module so call-time backward references resolve."""
from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

from documentai_ray.extras.analytics_extras_03 import *  # noqa: F401,F403,E402
from documentai_ray.extras.analytics_extras_03 import __all__ as _PREV_ALL  # noqa: E402




def ducci_int(seeds):
    """Ducci's four-number game — CYCLIC DIFFERENCE DYNAMICS, a
    family the surface lacked (gilbreath differences the primes
    once per row; Ducci iterates |a−b| around a CYCLE, and for
    tuple length 4 — a power of two — EVERY start reaches
    (0,0,0,0)): the kernel verifies the theorem EXHAUSTIVELY over
    ALL 16^4 = 65536 tuples with entries < 16 (every trajectory
    followed to zero, the classical ≤ ~20-step bound observed),
    then reports the census tuple's full trajectory.  Output:
    one row per step.  Mirror: the trajectory as a recursive
    CTE."""
    def step(t):
        return (abs(t[0] - t[1]), abs(t[1] - t[2]),
                abs(t[2] - t[3]), abs(t[3] - t[0]))

    max_steps = 0
    for m in range(16 ** 4):
        t = (m & 15, (m >> 4) & 15, (m >> 8) & 15, (m >> 12) & 15)
        s = 0
        while t != (0, 0, 0, 0):
            t = step(t)
            s += 1
            assert s <= 30
        max_steps = max(max_steps, s)
    assert max_steps <= 20

    t = tuple(int(s) % 100 for s in seeds[:4])
    rows = []
    s = 0
    while True:
        rows.append((s, t[0], t[1], t[2], t[3], max_steps))
        if t == (0, 0, 0, 0):
            break
        t = step(t)
        s += 1
        assert s < 40
    out = pd.DataFrame(rows, columns=["step", "a", "b", "c", "d",
                                      "max_steps_sub16"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _to_negabinary(n):
    if n == 0:
        return [0]
    ds = []
    while n != 0:
        d = n % 2
        if d < 0:
            d += 2
        ds.append(d)
        n = (n - d) // -2
    return ds                            # little-endian


def negabinary_int(seeds):
    """Negabinary representation — NEGATIVE-BASE NUMERATION, a
    family the surface lacked (zeckendorf changes the DIGIT
    WEIGHTS; base −2 changes their SIGNS, representing every
    integer — negative ones included — with digits 0/1 and NO
    sign bit): the kernel converts each census value v and −v,
    asserts the round trip Σ d_i·(−2)^i = n exactly, digits
    ∈ {0,1}, and UNIQUENESS exhaustively for |n| ≤ 256 (all
    bounded digit strings enumerated — distinct values, every
    target hit once).  Output: one row per (instance, digit).
    Mirror: the conversion as a recursive CTE with the
    floor-corrected digit rule (stated)."""
    # uniqueness: all 12-digit strings give distinct values and
    # cover [-1365, 682] fully... check the window [-256, 256]
    vals = {}
    for m in range(1 << 12):
        v = sum(((m >> i) & 1) * (-2) ** i for i in range(12))
        assert v not in vals or vals[v] == m
        if v in vals:
            assert vals[v] == m
        vals[v] = m
    for n in range(-256, 257):
        assert n in vals                 # coverage
    # distinctness: 4096 strings -> 4096 values
    assert len(vals) == 4096

    rows = []
    inst = 0
    for s in seeds:
        for sign in (1, -1):
            n = sign * (int(s) % 200 + 1)
            ds = _to_negabinary(n)
            assert sum(d * (-2) ** i
                       for i, d in enumerate(ds)) == n
            assert set(ds) <= {0, 1}
            for pos, d in enumerate(ds):
                rows.append((inst, n, pos, d, len(ds)))
            inst += 1
    out = pd.DataFrame(rows, columns=["inst", "n", "pos", "digit",
                                      "n_digits"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _to_balanced_ternary(n):
    if n == 0:
        return [0]
    ds = []
    while n != 0:
        d = n % 3
        if d == 2:
            d = -1
        ds.append(d)
        n = (n - d) // 3
    return ds


def balanced_ternary_int(seeds):
    """Balanced ternary — SIGNED-DIGIT NUMERATION (Knuth's
    'prettiest number system'), a family the surface lacked:
    digits −1, 0, 1 with weights 3^i represent every integer,
    negation is digitwise, and truncation rounds to NEAREST: the
    kernel converts census values ±v, asserts round trips,
    digitwise negation (digits of −n are the negated digits of
    n — checked), and uniqueness exhaustively for |n| ≤ 364 (all
    3^6 strings distinct, the window covered).  Output: one row
    per (instance, digit).  Mirror: the conversion recursion with
    the 2 → −1 digit correction."""
    vals = {}
    for m in range(3 ** 6):
        ds = []
        mm = m
        for _ in range(6):
            ds.append(mm % 3 - 1)
            mm //= 3
        v = sum(d * 3 ** i for i, d in enumerate(ds))
        assert v not in vals
        vals[v] = ds
    assert len(vals) == 729
    for n in range(-364, 365):
        assert n in vals

    rows = []
    inst = 0
    for s in seeds:
        v = int(s) % 300 + 1
        dpos = _to_balanced_ternary(v)
        dneg = _to_balanced_ternary(-v)
        assert dneg == [-d for d in dpos]          # negation law
        for n, ds in ((v, dpos), (-v, dneg)):
            assert sum(d * 3 ** i
                       for i, d in enumerate(ds)) == n
            assert set(ds) <= {-1, 0, 1}
            for pos, d in enumerate(ds):
                rows.append((inst, n, pos, d, len(ds)))
            inst += 1
    out = pd.DataFrame(rows, columns=["inst", "n", "pos", "digit",
                                      "n_digits"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


HAPPY_CYCLE = (4, 16, 37, 58, 89, 145, 42, 20)


def happy_numbers_int(seeds):
    """Happy numbers — DIGIT-SQUARE DYNAMICS, a family the
    surface lacked (kaprekar sorts and subtracts; the happy map
    squares digits): iterating n ↦ Σ digit², EVERY positive
    integer reaches either 1 (happy) or the unique 8-cycle
    4 → 16 → 37 → 58 → 89 → 145 → 42 → 20 → 4 — the kernel
    verifies the dichotomy EXHAUSTIVELY for all n ≤ 1000 (every
    trajectory lands in {1} ∪ cycle), asserts the cycle is
    genuinely an 8-cycle of the map, and counts the happy
    population (143 of the first 1000 — computed).  Census
    trajectories reported.  Output: (inst, step, value, is_happy).
    Mirror: the trajectory recursion with cycle detection by
    membership."""
    def dsq(n):
        s = 0
        while n:
            s += (n % 10) ** 2
            n //= 10
        return s

    for i, v in enumerate(HAPPY_CYCLE):
        assert dsq(v) == HAPPY_CYCLE[(i + 1) % 8]

    def classify(n):
        while n != 1 and n not in HAPPY_CYCLE:
            n = dsq(n)
        return n == 1

    n_happy = sum(1 for n in range(1, 1001) if classify(n))
    assert n_happy == 143

    rows = []
    for i, s in enumerate(seeds):
        n = int(s) % 1000 + 1
        happy = classify(n)
        cur, step = n, 0
        while True:
            rows.append((i, step, cur, 1 if happy else 0))
            if cur == 1 or cur in HAPPY_CYCLE:
                break
            cur = dsq(cur)
            step += 1
            assert step < 50
    out = pd.DataFrame(rows, columns=["inst", "step", "value",
                                      "is_happy"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def armstrong_numbers_int(sel_census):
    """Armstrong (narcissistic) numbers — DIGIT-POWER FIXED
    POINTS, a family the surface lacked: n equals the sum of its
    k-th-power digits (k = digit count); the kernel sweeps ALL
    n < 10^5 and asserts the complete list — 1..9, 153, 370, 371,
    407, 1634, 8208, 9474, 54748, 92727, 93084 — by computation
    (notably NO 2-digit Armstrong number exists, checked).
    Output: one row per Armstrong number, census flagged.
    Mirror: the same sweep with digit-power arithmetic."""
    arm = []
    for n in range(1, 10 ** 5):
        ds = str(n)
        k = len(ds)
        if sum(int(ch) ** k for ch in ds) == n:
            arm.append(n)
    assert arm == [1, 2, 3, 4, 5, 6, 7, 8, 9, 153, 370, 371,
                   407, 1634, 8208, 9474, 54748, 92727, 93084]
    assert not any(10 <= a <= 99 for a in arm)

    sel = int(sel_census) % len(arm)
    rows = [(i, v, len(str(v)), 1 if i == sel else 0, len(arm))
            for i, v in enumerate(arm)]
    out = pd.DataFrame(rows, columns=["idx", "n", "k", "selected",
                                      "n_armstrong"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def square_triangular_int(sel_census):
    """Square-triangular numbers — SIMULTANEOUS FIGURATE NUMBERS,
    a family the surface lacked (pell_equation solves x²−dy² = 1
    abstractly; here Pell DRIVES a concrete enumeration): N is
    both a square and a triangular number iff it comes from a
    solution of x² − 2y² = ±1, giving the recurrence
    N_{k+1} = 34·N_k − N_{k−1} + 2.  The kernel finds ALL
    square-triangular numbers ≤ 10^9 by EXHAUSTIVE isqrt sweep
    over triangular numbers (both characterizations tested
    per value) and asserts the list equals the recurrence's
    output — 0, 1, 36, 1225, 41616, 1413721, 48024900 — plus the
    square/triangular index pair per entry.  Output: one row per
    value with its square root and triangular index.  Mirror:
    the recurrence + per-row isqrt verification."""
    found = []
    t = 0
    k = 0
    while True:
        t = k * (k + 1) // 2
        if t > 10 ** 9:
            break
        r = math.isqrt(t)
        if r * r == t:
            found.append((t, r, k))
        k += 1

    rec = [0, 1]
    while True:
        nxt = 34 * rec[-1] - rec[-2] + 2
        if nxt > 10 ** 9:
            break
        rec.append(nxt)
    assert [v for v, _, _ in found] == rec
    assert rec == [0, 1, 36, 1225, 41616, 1413721, 48024900]

    sel = int(sel_census) % len(found)
    rows = [(i, v, r, k, 1 if i == sel else 0)
            for i, (v, r, k) in enumerate(found)]
    out = pd.DataFrame(rows, columns=["idx", "n", "sqrt_n",
                                      "tri_index", "selected"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


AMICABLE_MAX = 10000


def amicable_pairs_int(sel_census):
    """Amicable pairs below 10000 — ALIQUOT PAIR STRUCTURE, a
    family the surface lacked (perfect_numbers are the FIXED
    points of the aliquot map s(n) = σ(n) − n; amicable pairs are
    its 2-CYCLES): the kernel sieves σ and asserts the complete
    classical list — (220, 284), (1184, 1210), (2620, 2924),
    (5020, 5564), (6232, 6368) — by exhaustion, with s(s(a)) = a
    and a ≠ s(a) certified per pair (genuine 2-cycles, not fixed
    points).  Output: one row per pair, census flagged.  Mirror:
    the same divisor-sum join sweep."""
    sig = [0] * (AMICABLE_MAX * 2 + 1)
    for d in range(1, AMICABLE_MAX * 2 + 1):
        for m in range(d, AMICABLE_MAX * 2 + 1, d):
            sig[m] += d

    def s(n):
        return sig[n] - n

    pairs = []
    for a in range(2, AMICABLE_MAX + 1):
        b = s(a)
        if a < b <= AMICABLE_MAX and s(b) == a:
            pairs.append((a, b))
    assert pairs == [(220, 284), (1184, 1210), (2620, 2924),
                     (5020, 5564), (6232, 6368)]
    for a, b in pairs:
        assert s(s(a)) == a and s(a) != a

    sel = int(sel_census) % len(pairs)
    rows = [(i, a, b, s(a), s(b), 1 if i == sel else 0,
             len(pairs)) for i, (a, b) in enumerate(pairs)]
    out = pd.DataFrame(rows, columns=["idx", "a", "b", "s_a",
                                      "s_b", "selected",
                                      "n_pairs"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def vampire_numbers_int(sel_census):
    """Vampire numbers — DIGIT-PERMUTATION FACTORIZATIONS, a
    family the surface lacked: a 4-digit n is a vampire if
    n = a·b with two 2-digit fangs whose digits together are a
    permutation of n's (not both fangs ending in 0); the kernel
    sweeps ALL 2-digit fang pairs and asserts the complete list —
    1260, 1395, 1435, 1530, 1827, 2187, 6880 — with fangs per
    entry, by computation.  Output: one row per vampire number,
    census flagged.  Mirror: the fang join with sorted-digit
    multiset comparison."""
    vamps = {}
    for a in range(10, 100):
        for b in range(a, 100):
            n = a * b
            if not 1000 <= n <= 9999:
                continue
            if a % 10 == 0 and b % 10 == 0:
                continue
            if sorted(str(a) + str(b)) == sorted(str(n)):
                vamps.setdefault(n, (a, b))
    ns = sorted(vamps)
    assert ns == [1260, 1395, 1435, 1530, 1827, 2187, 6880]

    sel = int(sel_census) % len(ns)
    rows = [(i, n, vamps[n][0], vamps[n][1],
             1 if i == sel else 0, len(ns))
            for i, n in enumerate(ns)]
    out = pd.DataFrame(rows, columns=["idx", "n", "fang1",
                                      "fang2", "selected",
                                      "n_vampires"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def kaprekar_numbers_int(sel_census):
    """Kaprekar numbers — SQUARE-SPLIT IDENTITIES, a family the
    surface lacked (kaprekar iterates 6174's routine; Kaprekar
    NUMBERS are the unrelated split-sum fixed points): n is
    Kaprekar if n² split into a right part of d digits (d =
    digits of n) and a left part sums back to n (right part
    nonzero allowed per the classical convention, left may be 0
    for n = 1): the kernel sweeps n ≤ 1000 over ALL split points
    and asserts the classical list 1, 9, 45, 55, 99, 297, 703,
    999 — including the celebrity 297² = 88209, 88 + 209 = 297.
    Output: one row per Kaprekar number with its split, census
    flagged.  Mirror: the same sweep with integer split
    arithmetic."""
    kap = {}
    for n in range(1, 1001):
        sq = n * n
        s = str(sq)
        for cut in range(1, len(s) + 1):
            left = int(s[:-cut]) if cut < len(s) else 0
            right = int(s[-cut:])
            if right > 0 and left + right == n:
                kap.setdefault(n, (left, right))
                break
    ns = sorted(kap)
    assert ns == [1, 9, 45, 55, 99, 297, 703, 999]
    assert kap[297] == (88, 209)

    sel = int(sel_census) % len(ns)
    rows = [(i, n, n * n, kap[n][0], kap[n][1],
             1 if i == sel else 0, len(ns))
            for i, n in enumerate(ns)]
    out = pd.DataFrame(rows, columns=["idx", "n", "square",
                                      "left", "right", "selected",
                                      "n_kaprekar"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def automorphic_numbers_int(sel_census):
    """Automorphic numbers — TERMINAL-DIGIT FIXED POINTS, a
    family the surface lacked (armstrong is digit-power sums;
    automorphic n has n² ENDING in n, the discrete shadow of the
    2-adic idempotents): the kernel sweeps all n < 10^5 and
    asserts the complete list 1, 5, 6, 25, 76, 376, 625, 9376,
    90625 — and the COMPLEMENT LAW: the two k-digit automorphic
    numbers (beyond trivial 1) sum to 10^k + 1 (5+6 = 11,
    25+76 = 101, 376+625 = 1001 — the idempotent pairing e and
    1−e, verified where both exist).  Output: one row per
    automorphic number, census flagged.  Mirror: the sweep with
    modulus arithmetic."""
    auto = []
    for n in range(1, 10 ** 5):
        k = len(str(n))
        if (n * n) % 10 ** k == n:
            auto.append(n)
    assert auto == [1, 5, 6, 25, 76, 376, 625, 9376, 90625]
    by_k = {}
    for n in auto[1:]:
        by_k.setdefault(len(str(n)), []).append(n)
    for k, vs in by_k.items():
        if len(vs) == 2:
            assert vs[0] + vs[1] == 10 ** k + 1

    sel = int(sel_census) % len(auto)
    rows = [(i, n, len(str(n)), (n * n) % 10 ** len(str(n)),
             1 if i == sel else 0, len(auto))
            for i, n in enumerate(auto)]
    out = pd.DataFrame(rows, columns=["idx", "n", "k",
                                      "square_tail", "selected",
                                      "n_automorphic"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def harshad_numbers_int(seeds):
    """Harshad (Niven) numbers — DIGIT-SUM DIVISIBILITY, a family
    the surface lacked: n divisible by its digit sum; the kernel
    classifies ALL n ≤ 1000, computes the longest consecutive
    Harshad run on the range (the opening 1..10 is a 10-run; the
    kernel finds the true maximum by sweep, not assumption), and
    reports census classifications.  Output: (inst, n, digit_sum,
    is_harshad) plus the global longest-run columns.  Mirror: the
    same classification + a gaps-and-islands run census in
    SQL."""
    def dsum(n):
        return sum(int(c) for c in str(n))

    har = [n for n in range(1, 1001) if n % dsum(n) == 0]
    hs = set(har)
    best_len, best_start = 0, 0
    run, start = 0, 1
    for n in range(1, 1001):
        if n in hs:
            if run == 0:
                start = n
            run += 1
            if run > best_len:
                best_len, best_start = run, start
        else:
            run = 0
    assert best_len == 10 and best_start == 1   # the opening run

    rows = []
    for i, s in enumerate(seeds):
        n = int(s) % 1000 + 1
        rows.append((i, n, dsum(n), 1 if n in hs else 0,
                     best_len, best_start))
    out = pd.DataFrame(rows, columns=["inst", "n", "digit_sum",
                                      "is_harshad", "max_run",
                                      "max_run_start"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out

__all__ = sorted(set(_PREV_ALL) | set(['AMICABLE_MAX', 'HAPPY_CYCLE', '_to_balanced_ternary', '_to_negabinary', 'amicable_pairs_int', 'armstrong_numbers_int', 'automorphic_numbers_int', 'balanced_ternary_int', 'ducci_int', 'happy_numbers_int', 'harshad_numbers_int', 'kaprekar_numbers_int', 'negabinary_int', 'square_triangular_int', 'vampire_numbers_int']))
