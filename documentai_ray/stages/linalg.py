"""Exact 3x3 linear-system kernels — Cramer/adjugate arithmetic on
integer ppm matrices, the two classical applications stacked on top:

- Leontief input-output analysis (1936, Nobel 1973): given a ppm
  technology matrix A (input of sector i per unit output of sector
  j), the gross output meeting one unit of final demand per sector is
  x = (I - A)^-1 d — economics' oldest linear system.
- Absorbing Markov chains (Kemeny & Snell): fundamental matrix
  N = (I - Q)^-1 gives expected steps to absorption t = N.1 and
  absorption-probability split B = N.R — the conversion-funnel
  question asked exactly.

Everything is integer: with M = 1e6*I - A_ppm, the inverse is
adj(M)/det(M) with integer adjugate and determinant, so each output
component costs exactly ONE floor (numerators grow to ~1e24 — fine
for Python ints and DuckDB HUGEINT, envelopes documented at each
function).  Hawkins-Simon (all leading principal minors of M
positive) is the classical existence/nonnegativity condition; it is
computed, not assumed.
"""

from __future__ import annotations

import pandas as pd


def mat3_det(m: list[list[int]]) -> int:
    return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))


def mat3_cofactor(m: list[list[int]], i: int, j: int) -> int:
    rows = [r for r in range(3) if r != i]
    cols = [c for c in range(3) if c != j]
    minor = (m[rows[0]][cols[0]] * m[rows[1]][cols[1]]
             - m[rows[0]][cols[1]] * m[rows[1]][cols[0]])
    return minor if (i + j) % 2 == 0 else -minor


def mat3_adj_dot(m: list[list[int]], v: list[int]) -> list[int]:
    """(adj(M) . v)_i = sum_j C_ji v_j — exact integers."""
    return [sum(mat3_cofactor(m, j, i) * v[j] for j in range(3))
            for i in range(3)]


def hawkins_simon(m: list[list[int]]) -> bool:
    """All leading principal minors positive — the classical
    condition under which (I-A) is invertible with a NONNEGATIVE
    inverse (so gross outputs / expected visits can't go negative)."""
    d1 = m[0][0]
    d2 = m[0][0] * m[1][1] - m[0][1] * m[1][0]
    return d1 > 0 and d2 > 0 and mat3_det(m) > 0


def leontief_int(a_ppm: list[list[int]], sectors: list[str],
                 demand_unit: int = 1) -> pd.DataFrame:
    """Gross output x = (I - A)^-1 d for d = demand_unit per sector,
    exact: M = 1e6*I - A_ppm, x_milli_i = 1000 * 1e6 *
    (adj(M).d)_i // det(M) — ONE floor per sector.  Envelope:
    numerator <= 1e9 * 3 * 1e12 * demand ~ 3e21 * demand (HUGEINT in
    the mirror).  By the Neumann series x = d + Ad + A^2 d + ...,
    gross output dominates demand: x_milli >= 1000 * demand_unit
    whenever Hawkins-Simon holds (pinned)."""
    m = [[(1_000_000 if i == j else 0) - a_ppm[i][j]
          for j in range(3)] for i in range(3)]
    det = mat3_det(m)
    if det <= 0:
        raise ValueError("economy not productive (det <= 0)")
    num = mat3_adj_dot(m, [demand_unit] * 3)
    out = pd.DataFrame({
        "sector": sectors,
        "input_intensity_ppm": [sum(a_ppm[i][j] for i in range(3))
                                for j in range(3)],
        "gross_output_milli": [1000 * 1_000_000 * num[i] // det
                               for i in range(3)],
        "hs_ok": hawkins_simon(m)})
    for c in ("input_intensity_ppm", "gross_output_milli"):
        out[c] = out[c].astype("int64")
    return out


def absorbing_chain_int(q_ppm: list[list[int]],
                        r_ppm: list[list[int]],
                        states: list[str],
                        absorbing: list[str]) -> pd.DataFrame:
    """Fundamental-matrix summary of an absorbing chain with 3
    transient states and 2 absorbing states, exact: with
    M = 1e6*I - Q_ppm and N = 1e6 * adj(M)/det(M),

        steps_milli_i   = 1000 * 1e6 * (adj(M).1)_i // det
        absorb_ppm_i,a  = 1e6 * (adj(M).R[:,a])_i // det

    one floor each.  Envelope: absorb numerator <= 1e6 * 3 * 1e12 *
    1e6 ~ 3e24 (HUGEINT).  steps count the start state (Q = 0 gives
    exactly 1000 milli: one step to absorption); the absorb split
    sums to <= 1e6 (floor shave + any leaked mass from empirical
    rows not summing to 1e6)."""
    m = [[(1_000_000 if i == j else 0) - q_ppm[i][j]
          for j in range(3)] for i in range(3)]
    det = mat3_det(m)
    if det <= 0:
        raise ValueError("chain not absorbing (det <= 0)")
    steps_num = mat3_adj_dot(m, [1, 1, 1])
    cols = {"state": states,
            "steps_milli": [1000 * 1_000_000 * s // det
                            for s in steps_num]}
    for a, name in enumerate(absorbing):
        num = mat3_adj_dot(m, [r_ppm[i][a] for i in range(3)])
        cols[f"absorb_{name}_ppm"] = [1_000_000 * v // det
                                      for v in num]
    out = pd.DataFrame(cols)
    for c in out.columns:
        if c != "state":
            out[c] = out[c].astype("int64")
    return out
