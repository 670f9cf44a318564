"""Analytics/math kernels (part 1/4) — split out of ``stages/aggregates.py`` (VERDICT r2 #5). Chain link: star-imports the previous module so call-time backward references resolve."""
from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

# chain root: bind every CORE name (underscore ones included) from the
# partially-initialized aggregates module — its core defs all precede
# the chain import at its bottom, so this is well-defined
from documentai_ray.stages import aggregates as _agg_core  # noqa: E402

globals().update({_n: getattr(_agg_core, _n) for _n in _agg_core._CORE_ALL})
_PREV_ALL = list(_agg_core._CORE_ALL)




def chi2_independence_int(ds, *, key_col: str, cat_col: str):
    """Pearson χ² independence decomposition over a contingency grid,
    in exact integer ppm — completes the drift-test family: tvd_drift
    is the L1 view, ks_drift the sup view on ordered domains, this is
    the classic variance-weighted view that amplifies deviations in
    RARE cells (a 10-count surplus in a 20-expected cell screams where
    TVD barely moves). χ² itself is irrational only through division:
    with E = r·c/N each cell's term (O − E)²/E = (O·N − r·c)²/(N·r·c)
    is rational, so the statistic is DEFINED here as the sum of
    per-cell floors ``contrib_ppm = 10⁶·(O·N − r·c)² // (N·r·c)`` —
    deterministic, bit-exact in SQL HUGEINT (the (O·N − r·c)² term
    needs N ≲ 10⁹ to stay under 128 bits in the mirror; the Python
    side is arbitrary-precision int).

    Cells observed ZERO times still get rows — their (r·c)²-driven
    term is exactly the evidence an absent combination contributes,
    and dropping them understates dependence most where it is
    strongest. ONE exchange of per-batch (key, cat) count partials
    bounded by keys × categories; the grid fold is driver-side over
    that tiny frame. Returns (key, cat, n_obs, contrib_ppm) for every
    grid cell."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, cat_col]).to_pandas()
        g = (df.groupby([key_col, cat_col], as_index=False)
             .size().rename(columns={"size": "_n"}))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    cm = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby([key_col, cat_col])
          .aggregate(Sum("_n", alias_name="_n"))).to_pandas()
    if cm.empty:
        raise ValueError("chi2_independence_int: empty input")
    grid = cm.pivot_table(index=key_col, columns=cat_col,
                          values="_n", fill_value=0, aggfunc="sum")
    n = int(grid.to_numpy().sum())
    rows = []
    for key, r in grid.iterrows():
        rk = int(r.sum())
        for cat, o in r.items():
            ck = int(grid[cat].sum())
            o = int(o)
            contrib = 10**6 * (o * n - rk * ck) ** 2 // (n * rk * ck)
            rows.append((key, cat, o, contrib))
    out = pd.DataFrame(rows, columns=[key_col, cat_col, "n_obs",
                                      "contrib_ppm"])
    for c in ["n_obs", "contrib_ppm"]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
                   .replace_schema_metadata(None)


def grouped_kendall_int(ds, *, key_col: str, x_col: str, y_col: str):
    """Kendall concordance decomposition per group, in EXACT integers —
    the tie-aware rank-correlation primitive (tau) computed WITHOUT
    comparing the O(n²) row pairs: when x and y have small value
    domains, every pairwise comparison between rows is determined by
    their (x, y) joint-histogram cells, so concordant/discordant/tied
    pair counts are sums of c_i·c_j over cell pairs — per group that is
    ≤(|X|·|Y|)² cell products over a histogram that already fits on the
    driver, never n² row comparisons.  Complements ``grouped_linreg``
    (moment correlation) and ``mann_kendall_int`` (single-series TIME
    concordance): this is cross-sectional two-COLUMN concordance with
    the full tie decomposition.

    Inputs must be integer columns with bounded domains (document the
    bound at the call site; quantity×discount-cents here is ≤550 cells).

    Per group, with P = n(n−1)/2 total pairs:
        concordant C = Σ_{cells i<j, x_i<x_j, y_i<y_j} c_i·c_j
        discordant D = Σ_{cells i<j, x_i<x_j, y_i>y_j} c_i·c_j
        tied_x  Tx = Σ_x cx(cx−1)/2   (pairs sharing x, incl. both-tied)
        tied_y  Ty = Σ_y cy(cy−1)/2
        tied_xy Txy = Σ_cell c(c−1)/2
        identity  P = C + D + Tx + Ty − Txy   (asserted)
        tau_a_ppm = trunc(10⁶·(C−D) / P)      (SQL ``//`` trunc, can be <0)

    Physical plan: per-batch (key, x, y) count partials → ONE exchange
    bounded by |keys|·|X|·|Y| cells → vectorized numpy outer-comparison
    fold on the driver-side histogram.  Python bigints make the cell
    products exact at any n; the SQL mirror is a histogram self-join in
    HUGEINT."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, x_col, y_col]).to_pandas()
        g = (df.groupby([key_col, x_col, y_col], as_index=False)
             .size().rename(columns={"size": "_n"}))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, x_col, y_col])
            .aggregate(Sum("_n", alias_name="_n"))).to_pandas()
    if hist.empty:
        raise ValueError("grouped_kendall_int: empty input")

    rows = []
    for key, g in hist.groupby(key_col, sort=True):
        x = g[x_col].to_numpy().astype(object)   # object → Python ints,
        y = g[y_col].to_numpy().astype(object)   # products never overflow
        c = g["_n"].to_numpy().astype(object)
        n = int(c.sum())
        pairs = n * (n - 1) // 2
        cc = c[:, None] * c[None, :]
        xl = x[:, None] < x[None, :]
        conc = int(cc[xl & (y[:, None] < y[None, :])].sum())
        disc = int(cc[xl & (y[:, None] > y[None, :])].sum())
        tx = int(sum(v * (v - 1) // 2
                     for v in g.groupby(x_col)["_n"].sum().astype(object)))
        ty = int(sum(v * (v - 1) // 2
                     for v in g.groupby(y_col)["_n"].sum().astype(object)))
        txy = int(sum(int(v) * (int(v) - 1) // 2 for v in c))
        assert pairs == conc + disc + tx + ty - txy, \
            "grouped_kendall_int: pair identity violated"
        if pairs == 0:
            raise ValueError("grouped_kendall_int: group of size 1 has "
                             "no pairs")
        num = (conc - disc) * 1_000_000
        tau_a_ppm = abs(num) // pairs * (1 if num >= 0 else -1)
        rows.append((key, n, conc, disc, tx, ty, txy, tau_a_ppm))

    out = pd.DataFrame(rows, columns=[key_col, "n", "concordant",
                                      "discordant", "tied_x", "tied_y",
                                      "tied_xy", "tau_a_ppm"])
    for col in out.columns[1:]:
        out[col] = out[col].astype("int64")
    return out


def kruskal_wallis_int(hist: pd.DataFrame, *, val_col: str,
                       grp_col: str, n_col: str = "n") -> pd.DataFrame:
    """Integer Kruskal-Wallis fold over a (value, group) → count
    histogram.  Doubled midranks R'_v = 2·cl_v + nv_v + 1 (half-unit
    ties stay integral); per group R'_j = Σ n_vj·R'_v with the
    invariant Σ_j R'_j = n·(n+1) asserted.  Statistic with ONE floor
    per group (the cross-engine contract — DuckDB mirrors the same
    ``//``): S = Σ_j R'_j² // n_j, h_milli = max(0,
    (3000·S − 3000·n(n+1)²) // (n(n+1))).  The uncorrected H is
    corrected-H scaled by the tie factor C ∈ (0,1] so it is never
    negative, but the per-group floor losses (< k) can push the
    floored numerator a hair below zero near H = 0 — hence the
    clamp.  5% significance on chi²_{k−1} cross-multiplies the
    SHARED S in micro units so both engines flag identically.
    Returns one row per group (n_grp, rsum2) + the scalar h_milli /
    significant repeated on every row."""
    crit_micro = {1: 3_841_459, 2: 5_991_465, 3: 7_814_728,
                  4: 9_487_729, 5: 11_070_498}
    v = hist.groupby(val_col, as_index=False)[n_col].sum() \
            .sort_values(val_col)
    v["cl"] = v[n_col].cumsum().shift(fill_value=0)
    rp = {q: 2 * int(c) + int(m) + 1
          for q, c, m in zip(v[val_col], v["cl"], v[n_col])}
    h = hist.copy()
    h["_w"] = [int(m) * rp[q] for q, m in zip(h[val_col], h[n_col])]
    g = h.groupby(grp_col, as_index=False).agg(
        n_grp=(n_col, "sum"), rsum2=("_w", "sum"))
    n = int(g["n_grp"].sum())
    assert int(g["rsum2"].sum()) == n * (n + 1), \
        "kruskal_wallis_int: doubled-rank sum invariant violated"
    s = int(sum(int(r) * int(r) // int(m)
                for r, m in zip(g["rsum2"], g["n_grp"])))
    num = 3000 * s - 3000 * n * (n + 1) * (n + 1)
    h_milli = 0 if num < 0 else num // (n * (n + 1))
    crit = crit_micro[len(g) - 1]
    sig = (3_000_000 * s - 3_000_000 * n * (n + 1) * (n + 1)
           > crit * n * (n + 1))
    out = g.copy()
    out["h_milli"] = h_milli
    out["significant"] = bool(sig)
    for c in ("n_grp", "rsum2", "h_milli"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def fleiss_kappa_int(s_sq: int, cat_counts: dict) -> dict:
    """Integer Fleiss-kappa fold from the two sufficient statistics:
    s_sq = Σ_items Σ_cats n_ij² and per-category rating totals C_j
    (r raters is implied by M = Σ C_j = n·r; this repo's caller has
    r = 4).  kappa = [M(S−M) − (r−1)T] / [(r−1)(M²−T)] with
    T = Σ C_j², truncated toward zero at milli (matching SQL ``//``
    on a signed numerator); degenerate den=0 (every rating in one
    category) reports the perfect-agreement 1000 by convention."""
    m = sum(int(c) for c in cat_counts.values())
    n = m // 4
    t = sum(int(c) * int(c) for c in cat_counts.values())
    num = m * (int(s_sq) - m) - 3 * t
    den = 3 * (m * m - t)
    if den == 0:
        kappa = 1000
    else:
        kappa = (abs(num) * 1000 // den) * (1 if num >= 0 else -1)
    return {
        "n_items": n, "s_sq": int(s_sq),
        "pbar_ppm": 1_000_000 * (int(s_sq) - m) // (3 * m),
        "pe_ppm": 1_000_000 * t // (m * m),
        "kappa_milli": kappa}


def friedman_int(rsum2_by_grp: dict, n_blocks: int) -> tuple:
    """Integer Friedman fold from per-treatment DOUBLED within-block
    rank sums R'_j (blocks of size k each ranked 1..k with midrank
    ties doubled to stay integral; invariant Σ_j R'_j = n·k·(k+1)
    asserted).  Because every treatment appears in every block the
    group sizes are uniform and S = Σ_j R'_j² needs NO per-group
    floor — one exact division:

        chi2_milli = (3000·S − 3000·n²·k·(k+1)²) // (n·k·(k+1))

    (the 12/(nk(k+1))·ΣR² − 3n(k+1) classic after doubling; within-
    block tie correction omitted — it only shrinks the denominator).
    5% significance on chi²_{k−1} cross-multiplies S in micro so both
    engines flag identically.  Returns (chi2_milli, significant)."""
    crit_micro = {1: 3_841_459, 2: 5_991_465, 3: 7_814_728,
                  4: 9_487_729, 5: 11_070_498}
    n = int(n_blocks)
    k = len(rsum2_by_grp)
    s = sum(int(r) * int(r) for r in rsum2_by_grp.values())
    assert sum(int(r) for r in rsum2_by_grp.values()) \
        == n * k * (k + 1), "friedman_int: doubled-rank sum invariant"
    num = 3000 * s - 3000 * n * n * k * (k + 1) * (k + 1)
    chi2 = 0 if num < 0 else num // (n * k * (k + 1))
    sig = (3_000_000 * s - 3_000_000 * n * n * k * (k + 1) * (k + 1)
           > crit_micro[k - 1] * n * k * (k + 1))
    return chi2, bool(sig)


BH_CRITS_M5 = [6_634_897, 5_411_894, 4_709_292, 4_217_885, 3_841_459]


def bh_stepup_int(stats: list) -> list:
    """Benjamini-Hochberg step-UP fold over cleared χ² pieces:
    ``stats`` rows are (metric, n, chi2_milli, lhs, den) with
    lhs = n·(ad−bc)² so every threshold comparison cross-multiplies
    exactly (lhs·10⁶ > crit·den).  Rank 1 = largest χ² (ties by
    metric name — the holm convention); rank i faces the χ²₁
    critical value at α·i/m (``BH_CRITS_M5`` for m = 5).  The
    step-UP: i* = the LARGEST passing rank, and every rank ≤ i* is
    rejected — including ranks that fail their own bar (the exact
    point where BH differs from Holm's stop-at-first-failure).
    Returns (metric, rank, chi2_milli, crit_ppm, rejected) rows."""
    assert len(stats) == len(BH_CRITS_M5), \
        "bh_stepup_int: crit table is m=5"
    rows = sorted(stats, key=lambda r: (-r[2], r[0]))
    passes = [den > 0 and lhs * 1_000_000 > crit * den
              for (_, _, _, lhs, den), crit in zip(rows, BH_CRITS_M5)]
    i_star = max((i + 1 for i, p in enumerate(passes) if p),
                 default=0)
    return [(name, i + 1, chi2, crit, i + 1 <= i_star)
            for i, ((name, _, chi2, _, _), crit)
            in enumerate(zip(rows, BH_CRITS_M5))]


def copeland_int(counts: pd.DataFrame, *, voter_col: str,
                 cand_col: str, n_col: str = "n") -> pd.DataFrame:
    """Pairwise-majority (Condorcet/Copeland) fold over a
    (voter, candidate) → count ballot table — social choice over
    aggregates: each voter "prefers" candidate a to b iff its count
    for a strictly exceeds its count for b (equal counts express no
    preference, so a tie is NOT half a win — the abstention
    convention).  Missing (voter, candidate) cells count 0.

        beats(a,b)  = #voters with n_a > n_b          (integers)
        support(a)  = Σ_{b≠a} beats(a,b)   — under strict complete
                      rankings this IS the Borda count
        copeland(a) = Σ_{b≠a} sign(beats(a,b) − beats(b,a))

    A Condorcet winner (beats every opponent outright) has
    copeland = k−1; a majority CYCLE (rock-paper-scissors profiles)
    shows up as every candidate at the same copeland score — the
    phenomenon Borda alone cannot represent, pinned in the tests.
    Rank orders by (copeland desc, support desc, candidate) — the
    Borda tie-break is the standard Copeland refinement.  All
    integer; no floors anywhere."""
    piv = counts.pivot_table(index=voter_col, columns=cand_col,
                             values=n_col, fill_value=0,
                             aggfunc="sum")
    cands = sorted(piv.columns)
    mat = {c: piv[c].to_numpy() for c in cands}
    beats = {(a, b): int((mat[a] > mat[b]).sum())
             for a in cands for b in cands if a != b}
    rows = []
    for a in cands:
        sup = sum(beats[(a, b)] for b in cands if b != a)
        cop = sum((beats[(a, b)] > beats[(b, a)])
                  - (beats[(a, b)] < beats[(b, a)])
                  for b in cands if b != a)
        wins = sum(beats[(a, b)] > beats[(b, a)]
                   for b in cands if b != a)
        rows.append((a, sup, cop, wins == len(cands) - 1))
    out = pd.DataFrame(rows, columns=[cand_col, "support",
                                      "copeland", "is_condorcet"])
    out = out.sort_values(["copeland", "support", cand_col],
                          ascending=[False, False, True],
                          kind="mergesort").reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1)
    for c in ("support", "copeland", "rank"):
        out[c] = out[c].astype("int64")
    return out[[cand_col, "rank", "support", "copeland",
                "is_condorcet"]]


def dm_test_int(y: list, *, season: int = 7) -> dict:
    """Diebold-Mariano forecast-comparison fold over a gap-filled
    daily series ``y`` (Python ints, index = consecutive days):
    forecaster A is the NAIVE lag-1, forecaster B the SEASONAL
    naive lag-``season``; loss is absolute error (integer — the
    whole point: |e| needs no squaring blow-up and stays exact).
    Evaluation days t = season..n−1 (both forecasts defined).

        d_t = |y_t − y_{t−1}| − |y_t − y_{t−season}|
        S = Σd,  Q = Σd²,  n = #eval days
        DM² = d̄² / (σ̂²_d / n) = n·S² / (n·Q − S²)     (exact ratio)
        z2_milli = 1000·n·S² // (n·Q − S²)             (one floor)
        significant ⟺ 10⁶·n·S² > 3841459·(n·Q − S²)    (χ²₁, exact)

    better_sign = sign(S): +1 means the naive loss is larger (the
    seasonal forecaster wins), −1 the reverse, 0 a dead heat.  The
    h=1 small-sample variant (plain variance of d, no HAC window) —
    the published test statistic for one-step losses."""
    n_days = len(y)
    s = q = l1 = l2 = 0
    n = 0
    for t in range(season, n_days):
        e1 = abs(int(y[t]) - int(y[t - 1]))
        e2 = abs(int(y[t]) - int(y[t - season]))
        d = e1 - e2
        s += d
        q += d * d
        l1 += e1
        l2 += e2
        n += 1
    den = n * q - s * s
    z2 = 1000 * n * s * s // den if den > 0 else 0
    sig = 1_000_000 * n * s * s > 3_841_459 * den if den > 0 else False
    return {"n_days": n_days, "n_eval": n, "loss_naive": l1,
            "loss_seasonal": l2, "s_d": s, "q_d": q,
            "z2_milli": z2,
            "better_sign": (s > 0) - (s < 0),
            "significant": bool(sig)}


def mood_scale_int(hist: pd.DataFrame, *, val_col: str = "v",
                   grp_col: str = "tr", n_col: str = "n") -> dict:
    """Mood's two-sample SCALE test fold over a (value, group) →
    count histogram — the dispersion companion to the Mann-Whitney
    location test: two arms can share a median while one swings far
    wider, and a location test scores that 0 by construction.
    Mood's statistic sums squared deviations of the ranks from the
    center, so extreme ranks (either end!) testify and middling
    ranks don't.  Doubled midranks R'_v = 2·cl + nv + 1 keep ties
    integral; the per-individual score

        t_v = (R'_v − (N+1))²          (integer — doubled center
                                        2·(N+1)/2 is exactly N+1)

    is 4× the classic (R − (N+1)/2)².  With T = Σ_{group1} n·t,
    ST = Σ_all n·t, SQ = Σ_all n·t², conditional-on-ties moments:

        E[T]   = n₁·ST / N
        Var[T] = n₁·n₂·(N·SQ − ST²) / (N²·(N−1))
        D      = N·T − n₁·ST                    (integer, exact)
        z²     = D²·(N−1) / (n₁·n₂·(N·SQ − ST²))
        z2_milli = 1000·(N−1)·D² // den         (one floor)
        significant ⟺ 10⁶·(N−1)·D² > 3841459·den    (χ²₁ exact)

    scale_sign = sign(D): +1 means group 1's ranks sit FURTHER from
    the center — it is the more dispersed arm.  Everything in Python
    ints (t ~ N², SQ ~ N⁵ — past int64 at ~5k subjects); the SQL
    mirror's HUGEINT envelope holds to N ≈ 8k subjects, documented
    at the call site.  No relation to Mood's MEDIAN test (a 2×2 χ²
    on median splits) — this is the 1954 squared-rank-deviation
    scale statistic."""
    v = hist.groupby(val_col, as_index=False)[n_col].sum() \
            .sort_values(val_col)
    v["cl"] = v[n_col].cumsum().shift(fill_value=0)
    n_all = int(v[n_col].sum())
    rp = {q: 2 * int(c) + int(m) + 1
          for q, c, m in zip(v[val_col], v["cl"], v[n_col])}
    t_of = {q: (r - (n_all + 1)) ** 2 for q, r in rp.items()}
    st = sq = t1 = n1 = n2 = 0
    for q, g, m in zip(hist[val_col], hist[grp_col], hist[n_col]):
        t = t_of[q]
        m = int(m)
        st += m * t
        sq += m * t * t
        if g:
            t1 += m * t
            n1 += m
        else:
            n2 += m
    d = n_all * t1 - n1 * st
    den = n1 * n2 * (n_all * sq - st * st)
    z2 = 1000 * (n_all - 1) * d * d // den if den > 0 else 0
    sig = (1_000_000 * (n_all - 1) * d * d > 3_841_459 * den
           if den > 0 else False)
    return {"n_treat": n1, "n_ctrl": n2, "t_treat": t1,
            "st_all": st, "z2_milli": z2,
            "scale_sign": (d > 0) - (d < 0),
            "significant": bool(sig)}


def dhondt_int(votes: list, seats: int) -> pd.DataFrame:
    """D'Hondt highest-averages apportionment — PROPORTIONAL seat
    allocation, a family the surface lacks: top_tokens ranks and
    copeland_int orders pairwise, but "split a fixed house of S
    seats proportionally to vote counts" is its own problem with two
    classical method families (highest averages here; largest
    remainder in ``hamilton_int``), and their disagreements — the
    large-party bias of D'Hondt, the Alabama paradox Hamilton is
    famous for — are pinned phenomena, not implementation details.

    Each party p with v_p votes owns quotients v_p/d for divisors
    d = 1..S; the S largest quotients across all parties each seat
    one member.  Quotient ordering is EXACT: with L = lcm(1..S),
    v_p/d_1 > v_q/d_2  ⟺  v_p·(L/d_1) > v_q·(L/d_2) — every key is
    an integer because d | L, so no floats and no floors anywhere.
    Equal quotients (the 4/2 = 2/1 profile, pinned) break by larger
    raw votes then party name ascending — the published convention.

    ``votes`` is [(party, v)] with integer v ≥ 0; returns one row
    per party [party, votes, seats] (int64), sorted by
    (seats desc, votes desc, party)."""
    import math
    lcm = math.lcm(*range(1, seats + 1))
    quot = [(int(v) * (lcm // d), int(v), str(p), d)
            for p, v in votes for d in range(1, seats + 1)]
    quot.sort(key=lambda t: (-t[0], -t[1], t[2]))
    won: dict = {str(p): 0 for p, _ in votes}
    for _, _, p, _ in quot[:seats]:
        won[p] += 1
    out = pd.DataFrame(
        [(p, int(v), won[str(p)]) for p, v in votes],
        columns=["party", "votes", "seats"])
    out = out.sort_values(["seats", "votes", "party"],
                          ascending=[False, False, True],
                          kind="mergesort").reset_index(drop=True)
    for c in ("votes", "seats"):
        out[c] = out[c].astype("int64")
    return out


def hamilton_int(votes: list, seats: int) -> pd.DataFrame:
    """Hamilton (largest-remainder, Hare quota) apportionment — the
    OTHER classical method family next to ``dhondt_int``'s highest
    averages.  With T = Σ votes, party p's exact quota is v_p·S/T;
    it first receives base = v_p·S // T seats, and the R = S − Σbase
    leftover seats go to the largest remainders v_p·S mod T — every
    quantity an exact integer, no floors beyond the quota's own
    floor division (which IS the method).  Remainder ties break by
    larger votes then party name ascending.

    The defining pathology — the ALABAMA PARADOX, a party LOSING a
    seat when the house grows because its remainder rank slips — is
    pinned in the tests with the 5/3/1 profile (C seats 1 of 4 but
    0 of 5); divisor methods are immune by construction, which is
    exactly why both families are worth shipping side by side.

    Returns one row per party [party, votes, base_seats, remainder,
    seats] (int64), sorted by (seats desc, votes desc, party)."""
    total = sum(int(v) for _, v in votes)
    if total == 0:
        return pd.DataFrame(columns=["party", "votes", "base_seats",
                                     "remainder", "seats"])
    rows = [(str(p), int(v), int(v) * seats // total,
             int(v) * seats % total) for p, v in votes]
    leftover = seats - sum(b for _, _, b, _ in rows)
    ranked = sorted(rows, key=lambda t: (-t[3], -t[1], t[0]))
    bonus = {p: 1 if i < leftover else 0
             for i, (p, _, _, _) in enumerate(ranked)}
    out = pd.DataFrame(
        [(p, v, b, r, b + bonus[p]) for p, v, b, r in rows],
        columns=["party", "votes", "base_seats", "remainder",
                 "seats"])
    out = out.sort_values(["seats", "votes", "party"],
                          ascending=[False, False, True],
                          kind="mergesort").reset_index(drop=True)
    for c in ("votes", "base_seats", "remainder", "seats"):
        out[c] = out[c].astype("int64")
    return out


def pivotal_by_size_int(weights: list, quota: int) -> dict:
    """Coalition enumeration for the weighted-voting POWER-INDEX
    family (Banzhaf, Shapley-Shubik): for every player i and every
    coalition S ⊆ P∖{i}, i is PIVOTAL iff w(S) < quota ≤ w(S)+w_i.
    Returns {player: counts[s]} where counts[s] is the number of
    pivotal coalitions of size s = |S| (0..k−1) — the one table both
    indices read (Banzhaf sums it flat, Shapley-Shubik weighs size s
    by s!·(k−1−s)!).  Exhaustive over 2^k masks — players are the
    handful of event TYPES (k ≈ 5 → 32 coalitions), never rows; the
    k ≤ 20 guard documents the envelope."""
    names = [str(n) for n, _ in weights]
    w = [int(x) for _, x in weights]
    k = len(w)
    assert k <= 20, "pivotal_by_size_int: 2^k enumeration, k<=20"
    counts = {n: [0] * max(k, 1) for n in names}
    for mask in range(1 << k):
        wsum = 0
        sz = 0
        for j in range(k):
            if mask >> j & 1:
                wsum += w[j]
                sz += 1
        for i in range(k):
            if not (mask >> i & 1) and wsum < quota <= wsum + w[i]:
                counts[names[i]][sz] += 1
    return counts


def banzhaf_int(weights: list, quota: int = None) -> pd.DataFrame:
    """Banzhaf power index over the weighted voting game (players,
    integer weights, quota; default quota = strict majority
    T//2 + 1): swings_i = #coalitions i turns from losing to
    winning; power_ppm = 10⁶·swings_i // Σswings (ONE floor).  The
    family's whole point is that voting POWER is not proportional
    to weight — the classic (50,49,1)@51 profile gives 49 votes the
    SAME power as 1 vote (both 200000 ppm), pinned in the tests.
    Flags: is_dummy (zero swings — weight without power), is_veto
    (no coalition wins without i: w(P∖{i}) < quota).  All integers;
    exhaustive over 2^k coalitions of event TYPES (k ≈ 5)."""
    total = sum(int(v) for _, v in weights)
    if quota is None:
        quota = total // 2 + 1
    counts = pivotal_by_size_int(weights, quota)
    sw = {n: sum(c) for n, c in counts.items()}
    tot_sw = sum(sw.values())
    rows = [(str(n), int(v), sw[str(n)],
             1_000_000 * sw[str(n)] // tot_sw if tot_sw else 0,
             sw[str(n)] == 0, total - int(v) < quota)
            for n, v in weights]
    out = pd.DataFrame(rows, columns=["party", "weight", "swings",
                                      "power_ppm", "is_dummy",
                                      "is_veto"])
    out = out.sort_values(["swings", "weight", "party"],
                          ascending=[False, False, True],
                          kind="mergesort").reset_index(drop=True)
    for c in ("weight", "swings", "power_ppm"):
        out[c] = out[c].astype("int64")
    return out


def shapley_shubik_int(weights: list, quota: int = None) \
        -> pd.DataFrame:
    """Shapley-Shubik power index — the ORDERING companion to
    Banzhaf's coalition count: ss_i = #orderings of all k players
    in which i is the pivot (the one whose arrival pushes the
    running weight past quota), out of k! total.  From the shared
    pivotal-by-size table: ss_num_i = Σ_s s!·(k−1−s)!·counts_i[s]
    — exact integers (k ≈ 5 → k! = 120), Σ ss_num = k! whenever a
    winning coalition exists; ss_ppm = 10⁶·ss_num // k! (ONE
    floor).  Banzhaf and Shapley-Shubik RANK players identically
    but weigh them differently — (50,49,1)@51 reads 3/5,1/5,1/5
    under Banzhaf and 4/6,1/6,1/6 here, both pinned."""
    import math
    total = sum(int(v) for _, v in weights)
    if quota is None:
        quota = total // 2 + 1
    k = len(weights)
    counts = pivotal_by_size_int(weights, quota)
    kfact = math.factorial(k)
    rows = []
    for n, v in weights:
        num = sum(math.factorial(s) * math.factorial(k - 1 - s) * c
                  for s, c in enumerate(counts[str(n)]))
        rows.append((str(n), int(v), num,
                     1_000_000 * num // kfact))
    out = pd.DataFrame(rows, columns=["party", "weight", "ss_num",
                                      "ss_ppm"])
    out = out.sort_values(["ss_num", "weight", "party"],
                          ascending=[False, False, True],
                          kind="mergesort").reset_index(drop=True)
    for c in ("weight", "ss_num", "ss_ppm"):
        out[c] = out[c].astype("int64")
    return out


def iv_wald_int(cells: dict) -> dict:
    """Wald/IV LATE estimator — exact integer contract.

    ``cells`` maps z ∈ {0,1} → (n, sum_d, sum_y).  With the two
    encouragement cells (n1,d1,y1) / (n0,d0,y0):

        itt_y_ppm   = ss(10⁶·(y1·n0 − y0·n1) / (n1·n0))
        itt_d_ppm   = ss(10⁶·(d1·n0 − d0·n1) / (n1·n0))   (first stage)
        late_ppm    = ss(10⁶·(y1·n0 − y0·n1) / (d1·n0 − d0·n1))

    The LATE ratio clears BOTH per-cell means in one cross-multiplied
    floor — (ȳ1−ȳ0)/(d̄1−d̄0) = (y1·n0 − y0·n1)/(d1·n0 − d0·n1) —
    so perfect compliance (d1 = n1, d0 = 0) makes late == itt_y
    EXACTLY, and one-sided 50% compliance doubles it (both pinned).
    weak_instrument ⟺ |itt_d_ppm| < 100 000 (first stage under
    10 pp — a transparent ppm analogue of the F>10 folk rule);
    a ZERO first stage clamps late to 0 and flags weak (the ratio
    is undefined — no division happens)."""
    n1, d1, y1 = (int(v) for v in cells.get(1, (0, 0, 0)))
    n0, d0, y0 = (int(v) for v in cells.get(0, (0, 0, 0)))

    def ss(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    den_n = n1 * n0
    num_y = y1 * n0 - y0 * n1
    num_d = d1 * n0 - d0 * n1
    itt_y = ss(num_y, den_n)
    itt_d = ss(num_d, den_n)
    late = ss(num_y, num_d)
    return {"n_encouraged": n1, "n_control": n0,
            "takeup_enc": d1, "takeup_ctl": d0,
            "conv_enc": y1, "conv_ctl": y0,
            "itt_y_ppm": itt_y, "first_stage_ppm": itt_d,
            "late_ppm": late,
            "weak_instrument": abs(itt_d) < 100_000}


#: χ² 95% critical values ×10⁶ for df = 1..10 (shared with the SQL
#: mirrors — both engines compare against the SAME micro constants).
CHI2_CRIT_MICRO = [0, 3841459, 5991465, 7814728, 9487729, 11070498,
                   12591587, 14067140, 15507313, 16918978, 18307038]


def meta_fixed_int(strata: list) -> pd.DataFrame:
    """Fixed-effect (inverse-variance) meta-analysis of per-stratum
    risk differences + Cochran's Q heterogeneity + Higgins' I² —
    exact integer contract, every floor documented:

        d_ppm   = ss(10⁶·(ct·nc − cc·nt) / (nt·nc))       (1 floor)
        v_ppm2  = 10¹²·ct·(nt−ct) // nt³
                + 10¹²·cc·(nc−cc) // nc³                   (2 floors)
        w       = 10¹² // v_ppm2                           (1 floor)
        pooled  = Σ w·d // Σ w  (sign-split, NO extra scale —
                  w·d/w is already in ppm)                 (1 floor)
        Q_scaled = Σ w·d² − (Σ w·d)² // Σ w   (≈ 10¹²·Q, 1 floor)
        q_milli = Q_scaled // 10⁹, clamped at 0            (1 floor)
        i2_ppm  = 10⁶·(q_milli − 1000·df) // q_milli, clamp 0
        heterogeneous ⟺ 1000·q_milli > CHI2_CRIT_MICRO[df]

    Strata with an empty arm or ZERO variance (all-or-none cells —
    w would be infinite) are EXCLUDED from the pool and df; their
    rows still emit with w_scaled = 0 (pinned).  Identical strata
    collapse Q to exactly 0 (Σw·d = d·Σw makes the computational
    form vanish with no flooring residue — pinned); one flipped
    stratum blows Q past the χ²_df bar.  HUGEINT envelope: nt³·10¹²
    ≤ 3.4e21 at nt = 1500; (Σw·d)² ≤ ~2.5e37 at k = 5 strata with
    |d| ≤ 10⁶ — inside HUGEINT, documented at the mirror.

    ``strata``: list of (label, nt, ct, nc, cc) sorted by label."""
    def ss(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    per = []
    for label, nt, ct, nc, cc in strata:
        nt, ct, nc, cc = int(nt), int(ct), int(nc), int(cc)
        d = ss(ct * nc - cc * nt, nt * nc)
        if nt == 0 or nc == 0:
            per.append((label, nt, ct, nc, cc, d, 0))
            continue
        v = (10**12 * ct * (nt - ct)) // nt**3 \
            + (10**12 * cc * (nc - cc)) // nc**3
        w = 10**12 // v if v > 0 else 0
        per.append((label, nt, ct, nc, cc, d, w))
    used = [(d, w) for *_, d, w in per if w > 0]
    sw = sum(w for _, w in used)
    s1 = sum(w * d for d, w in used)
    sq = sum(w * d * d for d, w in used)
    if sw > 0:
        sign = 1 if s1 >= 0 else -1
        pooled = sign * (abs(s1) // sw)
    else:
        pooled = 0
    q_scaled = sq - (s1 * s1 // sw if sw > 0 else 0)
    q_milli = max(0, q_scaled) // 10**9
    df = max(0, len(used) - 1)
    i2 = (1_000_000 * (q_milli - 1000 * df) // q_milli
          if q_milli > 1000 * df else 0)
    het = (df >= 1 and df <= 10
           and 1000 * q_milli > CHI2_CRIT_MICRO[df])
    rows = [{"stratum": label, "nt": nt, "ct": ct, "nc": nc,
             "cc": cc, "d_ppm": d, "w_scaled": w,
             "pooled_ppm": pooled, "q_milli": q_milli,
             "i2_ppm": i2, "df": df, "heterogeneous": het}
            for label, nt, ct, nc, cc, d, w in per]
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c not in ("stratum", "heterogeneous"):
            out[c] = out[c].astype("int64")
    return out


def erlang_b_int(a_micro: int, servers: int = 10) -> pd.DataFrame:
    """Erlang-B blocking probability chain — TELETRAFFIC capacity
    planning as exact chained floors (the km_survival discipline:
    sequential folds keep ONE floor per step and both engines replay
    the identical chain).  Offered load a (micro-erlangs); for
    c = 1..servers:

        b_0 = 10⁶
        b_c = 10⁶·A·b_{c−1} // (c·10¹² + A·b_{c−1})     (1 floor/step)

    which is the classic recursion B_c = a·B_{c−1}/(c + a·B_{c−1})
    in ppm.  At a = 1 erlang the first three steps are EXACT with
    zero flooring residue — B₁ = 1/2, B₂ = 1/5, B₃ = 1/16 (500000
    / 200000 / 62500 ppm, pinned) because each numerator divides
    its denominator; B₄ = 1/65 is the first step that floors
    (15384 ppm), and from there both engines replay the identical
    floored chain.  a = 0 kills every step; blocking is
    monotone non-increasing in c (more servers never block more —
    pinned).  carried_micro = A·(10⁶ − b_c) // 10⁶ (1 floor);
    meets_sla ⟺ b_c < 10 000 ppm (1% blocking, the classic GoS
    bar).  Envelope: 10⁶·A·b ≤ 10¹⁸·A_erlang — HUGEINT-safe to
    ~10¹⁹ micro-erlangs, far past any hourly event peak."""
    A = int(a_micro)
    rows = []
    b = 10**6
    for c in range(1, int(servers) + 1):
        num = 10**6 * A * b
        den = c * 10**12 + A * b
        b = num // den if den > 0 else 0
        rows.append({"servers": c, "a_micro": A,
                     "blocking_ppm": b,
                     "carried_micro": A * (10**6 - b) // 10**6,
                     "meets_sla": b < 10_000})
    out = pd.DataFrame(rows)
    for c in ("servers", "a_micro", "blocking_ppm", "carried_micro"):
        out[c] = out[c].astype("int64")
    return out


#: WSPT priority weights for the TPC-H order priority vocabulary —
#: shared with the SQL mirror; 60 = lcm(1..5) clears every weight so
#: the Smith-ratio p/w orders EXACTLY via the integer key p·(60//w).
WSPT_WEIGHTS = {"1-URGENT": 5, "2-HIGH": 4, "3-MEDIUM": 3,
                "4-NOT SPECIFIED": 2, "5-LOW": 1}


def wspt_objective_int(jobs: list) -> pd.DataFrame:
    """Smith's-rule (WSPT) single-machine schedule objective — exact
    integers, driver kernel for hand pins (the distributed query
    computes the same numbers via bucketed prefix sums).

    ``jobs``: (p, w, tiebreak) with w ∈ 1..5.  WSPT order = ascending
    key p·(60//w) (ties by tiebreak) — EXACT Smith-ratio order, no
    floats, no floors; completion C_j = running Σp; objective
    Σ w_j·C_j is MINIMAL over all orders (Smith 1956, the adjacent-
    exchange argument — equal ratios are exchange-invariant, pinned).
    FIFO baseline = tiebreak order.  Returns one row per weight class
    with wct under both orders + globals repeated."""
    by_wspt = sorted(jobs, key=lambda j: (j[0] * (60 // j[1]), j[2]))
    by_fifo = sorted(jobs, key=lambda j: j[2])

    def fold(order):
        run, per = 0, {}
        for p, w, _ in order:
            run += p
            per[w] = per.get(w, 0) + w * run
        return per

    wspt, fifo = fold(by_wspt), fold(by_fifo)
    tot_w, tot_f = sum(wspt.values()), sum(fifo.values())
    imp = (1_000_000 * (tot_f - tot_w) // tot_f) if tot_f > 0 else 0
    stats = {}
    for p, w, _ in jobs:
        n, sp = stats.get(w, (0, 0))
        stats[w] = (n + 1, sp + p)
    rows = [{"w": w, "n_jobs": n, "sum_p": sp,
             "wct_wspt": wspt.get(w, 0), "wct_fifo": fifo.get(w, 0),
             "total_wspt": tot_w, "total_fifo": tot_f,
             "improvement_ppm": imp}
            for w, (n, sp) in sorted(stats.items())]
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def position_auction_int(bids: list, ctrs: list) -> pd.DataFrame:
    """GSP vs VCG position-auction settlement — AUCTION THEORY as
    exact integers, the non-cooperative companion of the
    banzhaf/shapley cooperative batch (Edelman-Ostrovsky-Schwarz
    2007 / Varian 2007 position auctions).

    ``bids``: (name, bid) integer bids; ``ctrs``: strictly
    decreasing positive slot click rates (per mille).  Rank bids
    desc, ties by name asc.  For slot i (1-based), with b_j the
    j-th ranked bid (0 past the field) and c_j the slot CTRs
    (c_{S+1} = 0):

        gsp_pay_i = c_i · b_{i+1}                 (next-price rule)
        vcg_pay_i = Σ_{j≥i} (c_j − c_{j+1}) · b_{j+1}   (externality)

    Both are PURE integer products/sums — no floors anywhere except
    the final overcharge_ppm = 10⁶·(R_gsp − R_vcg) // R_gsp, whose
    numerator is provably nonneg: c_i·b_{i+1} = Σ_{j≥i}
    (c_j − c_{j+1})·b_{i+1} ≥ Σ_{j≥i} (c_j − c_{j+1})·b_{j+1}
    term-by-term since bids descend — GSP payment dominates VCG in
    EVERY slot, with equality at the last slot (both read
    c_S·b_{S+1}) and in the single-slot case, where both collapse
    to Vickrey's second price.  Truthful-bidding utility under VCG
    is nonneg: c_i·b_i ≥ vcg_pay_i (same telescoping).  Only
    filled slots emit (slot i needs an i-th bidder); a slot whose
    next bid is past the field pays 0 under both rules."""
    ranked = sorted(bids, key=lambda x: (-x[1], x[0]))
    S = min(len(ctrs), len(ranked))
    c = list(ctrs[:S]) + [0]
    b = [v for _, v in ranked]

    def nxt(j):  # b_{j+1}, 0 past the field (j is 1-based slot)
        return b[j] if j < len(b) else 0

    vcg_suffix = 0
    vcg = {}
    for i in range(S, 0, -1):
        vcg_suffix += (c[i - 1] - c[i]) * nxt(i)
        vcg[i] = vcg_suffix
    rows = []
    for i in range(1, S + 1):
        gsp = c[i - 1] * nxt(i)
        rows.append({"slot": i, "ctr_permille": c[i - 1],
                     "bidder": ranked[i - 1][0],
                     "bid_micro": ranked[i - 1][1],
                     "next_bid_micro": nxt(i),
                     "gsp_pay": gsp, "vcg_pay": vcg[i]})
    out = pd.DataFrame(rows)
    rg, rv = int(out["gsp_pay"].sum()), int(out["vcg_pay"].sum())
    out["gsp_revenue"] = rg
    out["vcg_revenue"] = rv
    out["overcharge_ppm"] = (1_000_000 * (rg - rv) // rg
                             if rg > 0 else 0)
    out["gsp_dominates"] = out["gsp_pay"] >= out["vcg_pay"]
    for col in out.columns:
        if col not in ("bidder", "gsp_dominates"):
            out[col] = out[col].astype("int64")
    return out


def _ss_scaled(num: int, den: int, scale: int) -> int:
    """Sign-split trunc division at an explicit scale (Python floors,
    DuckDB truncates on negatives — the repo-wide discipline)."""
    if den == 0:
        return 0
    s = 1 if (num >= 0) == (den > 0) else -1
    return s * (scale * abs(num) // abs(den))


def nash_2x2_int(A: list, B: list) -> pd.DataFrame:
    """Nash equilibria of a 2×2 bimatrix game — NON-COOPERATIVE
    game theory, the solution-concept complement of the cooperative
    (banzhaf/shapley) and mechanism-design (gsp/vcg) batches.

    ``A``/``B``: 2×2 integer payoff matrices (row / column player).
    Pure NE at (i, j) ⟺ A[i][j] ≥ A[1−i][j] AND B[i][j] ≥
    B[i][1−j] (weak best responses — ties admit multiple NE).  The
    interior mixed equilibrium makes the OPPONENT indifferent:

        p·dB = B11 − B10,  dB = B00 − B01 − B10 + B11
        q·dA = A11 − A01,  dA = A00 − A10 − A01 + A11

    (p = row's weight on action 0, q = column's) — EXACT rationals,
    interior ⟺ 0 < num/den < 1 checked on the integers, one nonneg
    floor each when interior (the fraction is then in (0,1) so
    |num| ≤ |den| and no sign-split is needed); non-interior games
    report 0/0 with mixed_interior = False.  The classic trio is
    pinned in the tests: matching pennies (0 pure, p = q = 1/2
    exact), prisoner's dilemma (1 pure, no interior mixed), battle
    of the sexes (2 pure + p = 2/3, q = 1/3) — and their
    equilibrium counts 1/1/3 are all ODD (Wilson 1971, generic
    games).  One row per cell, globals repeated (the kruskal
    row-shape convention)."""
    def pure(i, j):
        return (A[i][j] >= A[1 - i][j]) and (B[i][j] >= B[i][1 - j])

    dB = B[0][0] - B[0][1] - B[1][0] + B[1][1]
    num_p = B[1][1] - B[1][0]
    dA = A[0][0] - A[1][0] - A[0][1] + A[1][1]
    num_q = A[1][1] - A[0][1]

    def interior(num, den):
        return (den > 0 and 0 < num < den) \
            or (den < 0 and den < num < 0)

    ok = interior(num_p, dB) and interior(num_q, dA)
    p = 1_000_000 * abs(num_p) // abs(dB) if ok else 0
    q = 1_000_000 * abs(num_q) // abs(dA) if ok else 0
    n_pure = sum(pure(i, j) for i in (0, 1) for j in (0, 1))
    rows = [{"row_action": i, "col_action": j,
             "a_pay": A[i][j], "b_pay": B[i][j],
             "is_pure_ne": pure(i, j), "n_pure_ne": n_pure,
             "p_mixed_ppm": p, "q_mixed_ppm": q,
             "mixed_interior": ok}
            for i in (0, 1) for j in (0, 1)]
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c not in ("is_pure_ne", "mixed_interior"):
            out[c] = out[c].astype("int64")
    return out


def zerosum_value_int(A: list) -> pd.DataFrame:
    """Value of a 2×2 zero-sum game — von Neumann's minimax, the
    third leg of the game-theory suite (cooperative → mechanism →
    non-cooperative → ZERO-SUM).  ``A``: 2×2 integer payoffs to
    the row player.

    maximin = max_i min_j A[i][j]; minimax = min_j max_i A[i][j];
    maximin ≤ minimax ALWAYS, with equality ⟺ a saddle point
    (pure value, zero flooring).  Without a saddle the mixed value
    is the EXACT rational

        v = (A00·A11 − A01·A10) / D,   D = A00 + A11 − A01 − A10
        p = (A11 − A10)/D,  q = (A11 − A01)/D

    (D ≠ 0 whenever no saddle exists), reported as ONE sign-split
    milli floor — v can be negative, p/q are interior so nonneg
    floors suffice — and the minimax theorem maximin ≤ v ≤ minimax
    is pinned.  Saddle games report the pure value exactly
    (value_milli = 1000·maximin) with p/q degenerate at the
    saddle's row/column (ties → action 0)."""
    mins = [min(A[i]) for i in (0, 1)]
    maxs = [max(A[0][j], A[1][j]) for j in (0, 1)]
    maximin, minimax = max(mins), min(maxs)
    saddle = maximin == minimax
    if saddle:
        v_milli = 1000 * maximin
        p = 1_000_000 if mins[0] == maximin else 0
        q = 1_000_000 if maxs[0] == minimax else 0
    else:
        D = A[0][0] + A[1][1] - A[0][1] - A[1][0]
        v_milli = _ss_scaled(A[0][0] * A[1][1] - A[0][1] * A[1][0],
                             D, 1000)
        p = _ss_scaled(A[1][1] - A[1][0], D, 1_000_000)
        q = _ss_scaled(A[1][1] - A[0][1], D, 1_000_000)
    out = pd.DataFrame([{
        "a00": A[0][0], "a01": A[0][1],
        "a10": A[1][0], "a11": A[1][1],
        "maximin_milli": 1000 * maximin,
        "minimax_milli": 1000 * minimax,
        "has_saddle": saddle, "value_milli": v_milli,
        "p_row_ppm": p, "q_col_ppm": q}])
    for c in out.columns:
        if c != "has_saddle":
            out[c] = out[c].astype("int64")
    return out


def system_reliability_int(rel: list) -> pd.DataFrame:
    """Series / parallel system reliability — RELIABILITY
    ENGINEERING as exact HUGEINT-style products with ONE final
    floor each.  ``rel``: (name, r_ppm) component reliabilities.

        series   = Π r_i            // 10⁶⁽ⁿ⁻¹⁾
        parallel = (10⁶ⁿ − Π f_i)   // 10⁶⁽ⁿ⁻¹⁾,   f_i = 10⁶ − r_i

    The parallel form uses the COMPLEMENT-NUMERATOR (not
    10⁶ − Πf//10⁶⁽ⁿ⁻¹⁾, which can differ by 1 ppm when the product
    has flooring residue) precisely so the k-of-n bridge identities
    in ``koon_reliability_int`` are EXACT: 1-of-n == parallel and
    n-of-n == series, same flooring, bit for bit.  Weakest-link law
    pinned: series ≤ min r_i (a chain is its weakest link);
    dually parallel ≥ max r_i.  Two fair coins read 250000 /
    750000 exactly.  Envelope: Π ≤ 10⁶ⁿ = 10³⁰ at n = 5 — Python
    ints are unbounded, the SQL mirror's HUGEINT holds to n ≤ 6."""
    comps = sorted(rel)
    n = len(comps)
    scale = 10 ** (6 * (n - 1))
    pr = pf = 1
    for _, r in comps:
        pr *= r
        pf *= 10**6 - r
    series = pr // scale
    parallel = (10 ** (6 * n) - pf) // scale
    rmin = min(r for _, r in comps)
    rows = [{"component": name, "r_ppm": r, "f_ppm": 10**6 - r,
             "series_ppm": series, "parallel_ppm": parallel,
             "is_weakest": r == rmin}
            for name, r in comps]
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c not in ("component", "is_weakest"):
            out[c] = out[c].astype("int64")
    return out


def koon_reliability_int(rel: list) -> pd.DataFrame:
    """k-out-of-n system reliability for EVERY k = 1..n — the
    redundancy family's full ladder, exhaustive over 2ⁿ component
    states (the banzhaf bitmask discipline: n is the HANDFUL of
    event types, 2⁵ = 32 states, never rows):

        R(k) = Σ_{|S| ≥ k}  Π_{i∈S} r_i · Π_{i∉S} f_i  // 10⁶⁽ⁿ⁻¹⁾

    ONE floor per k, on the exact subset-sum numerator.  The ladder
    BRIDGES the two classical compositions exactly — R(1) ==
    parallel and R(n) == series of ``system_reliability_int``, same
    flooring (the reason that kernel's parallel uses the
    complement-numerator form) — and is monotone non-increasing in
    k (demanding more working components never helps).  Textbook
    pins: majority-of-three fair coins reads EXACTLY 500000;
    triple-modular-redundancy at r = 0.9 reads EXACTLY 972000
    (3·0.81·0.1 + 0.729 — the canonical TMR improvement).
    Envelope: Σ over 2ⁿ masks of products ≤ 2ⁿ·10⁶ⁿ ≈ 3·10³¹ at
    n = 5 — HUGEINT-safe in the mirror to n ≤ 6."""
    comps = sorted(rel)
    n = len(comps)
    scale = 10 ** (6 * (n - 1))
    sums = [0] * (n + 1)  # sums[b] = Σ products over masks of b bits
    for mask in range(1 << n):
        prod, bits = 1, 0
        for idx, (_, r) in enumerate(comps):
            if (mask >> idx) & 1:
                prod *= r
                bits += 1
            else:
                prod *= 10**6 - r
        sums[bits] += prod
    rows = []
    for k in range(1, n + 1):
        num = sum(sums[k:])
        rows.append({"k": k, "n_components": n,
                     "r_koon_ppm": num // scale})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def luhn_sum_int(num: int, shift: int = 0) -> int:
    """Luhn mod-10 weighted digit sum (ISO/IEC 7812) — exact
    integers.  Digit at position i from the RIGHT is doubled when
    (i + shift) is odd, with the classic subtract-9 fold back to a
    single digit.  ``shift=0`` scores a number as-is; ``shift=1``
    scores it as the PREFIX of a number about to receive a check
    digit (appending shifts every digit one position left)."""
    s, i = 0, 0
    n = int(num)
    while n > 0:
        d = n % 10
        if (i + shift) % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s += d
        n //= 10
        i += 1
    return s


def luhn_valid_int(num: int) -> bool:
    """A number is Luhn-valid ⟺ its weighted digit sum ≡ 0 mod 10.
    Detects EVERY single-digit substitution and every adjacent
    transposition EXCEPT 09↔90 — the algorithm's one documented
    blind spot, pinned in the tests."""
    return luhn_sum_int(num) % 10 == 0


def luhn_check_digit_int(num: int) -> int:
    """The digit cd making 10·num + cd Luhn-valid:
    (10 − S₁) mod 10 with S₁ the shift-1 sum (appending moves every
    existing digit into the next parity class)."""
    return (10 - luhn_sum_int(num, shift=1) % 10) % 10


#: Hamming(7,4) layout: positions 1..7 = p1 p2 d3 p4 d2 d1 d0,
#: parity bits at the powers of two, each covering the positions
#: whose index has that bit set.  Shared with the SQL mirror.
def hamming74_int(nibble: int, err_pos: int,
                  err_pos2: int = 0) -> dict:
    """Hamming(7,4) encode → single-bit corrupt → syndrome decode,
    exact integers (CODING THEORY: the 1950 single-error-correcting
    code).  ``nibble`` ∈ 0..15 (d3 d2 d1 d0), ``err_pos`` ∈ 0..7
    (0 = clean channel, 1..7 = flip that codeword position).

    Parities (even): p1 = d3⊕d2⊕d0, p2 = d3⊕d1⊕d0,
    p4 = d2⊕d1⊕d0.  The syndrome s = s4s2s1 recomputed from the
    received word IS the error position in binary — Hamming's
    defining trick — so every single-bit error is corrected and
    decode returns the original nibble EXACTLY (exhaustive 16×8
    pin in the tests).  A DOUBLE error mis-corrects (syndrome
    points at the XOR of the two positions) — the SEC code's
    documented failure mode, also pinned."""
    d0, d1 = nibble & 1, (nibble >> 1) & 1
    d2, d3 = (nibble >> 2) & 1, (nibble >> 3) & 1
    p1 = d3 ^ d2 ^ d0
    p2 = d3 ^ d1 ^ d0
    p4 = d2 ^ d1 ^ d0
    bits = {1: p1, 2: p2, 3: d3, 4: p4, 5: d2, 6: d1, 7: d0}
    recv = dict(bits)
    if err_pos:
        recv[err_pos] ^= 1
    if err_pos2:
        recv[err_pos2] ^= 1
    s1 = recv[1] ^ recv[3] ^ recv[5] ^ recv[7]
    s2 = recv[2] ^ recv[3] ^ recv[6] ^ recv[7]
    s4 = recv[4] ^ recv[5] ^ recv[6] ^ recv[7]
    syndrome = 4 * s4 + 2 * s2 + s1
    if syndrome:
        recv[syndrome] ^= 1
    decoded = 8 * recv[3] + 4 * recv[5] + 2 * recv[6] + recv[7]
    codeword = sum(bits[p] << (7 - p) for p in range(1, 8))
    return {"codeword": codeword, "syndrome": syndrome,
            "decoded": decoded}


def sir_epidemic_int(beta_ppm: int, gamma_ppm: int, i0_ppm: int,
                     steps: int = 24) -> pd.DataFrame:
    """Discrete Kermack-McKendrick SIR epidemic (1927) on a ppm
    population — POPULATION DYNAMICS as an exact chained integer
    fold (the km_survival / erlang_blocking sequential discipline:
    fixed, data-INdependent length, so a recursive SQL mirror is
    honest).  Per step, with S, I, R in ppm of the population:

        new_inf = beta * S * I // 1e12     (one floor)
        recov   = gamma * I // 1e6         (one floor)
        S' = S - new_inf;  I' = I + new_inf - recov;  R' = R + recov

    Both updates are TRANSFERS, so S + I + R == 1e6 EXACTLY at every
    step — conservation is bit-exact by construction, not
    approximate (pinned).  new_inf <= S (since beta*I <= 1e12) and
    recov <= I, so every compartment stays nonneg with no clamp.
    Max product beta*S*I <= 1e18 < int64 max; the mirror still casts
    HUGEINT for headroom.  Classical structure pinned in tests:
    geometric decay at beta = 0 (chain replay of floors), epidemic
    threshold (I monotone DOWN when beta*S0 < gamma*1e6, i.e.
    R_eff < 1), epidemic peak-and-decline above threshold, S
    non-increasing / R non-decreasing always."""
    s, i, r = 1_000_000 - i0_ppm, i0_ppm, 0
    rows = [(0, s, i, r)]
    for t in range(1, steps + 1):
        new_inf = beta_ppm * s * i // 1_000_000_000_000
        recov = gamma_ppm * i // 1_000_000
        s -= new_inf
        i += new_inf - recov
        r += recov
        rows.append((t, s, i, r))
    out = pd.DataFrame(rows, columns=["t", "s_ppm", "i_ppm",
                                      "r_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lotka_volterra_int(a_ppm: int, b_ppm: int, c_ppm: int,
                       d_ppm: int, x0_ppm: int, y0_ppm: int,
                       steps: int = 24) -> pd.DataFrame:
    """Discrete Lotka-Volterra predator-prey dynamics (1925/26) —
    the two-species companion of the SIR fold.  Per step, prey x
    and predator y in ppm:

        growth     = a * x // 1e6          (one floor)
        predation  = b * x * y // 1e12     (one floor)
        starvation = c * y // 1e6          (one floor)
        conversion = d * x * y // 1e12     (one floor)
        x' = max(0, x + growth - predation)
        y' = max(0, y - starvation + conversion)

    The explicit max(0, .) clamp is the discrete-Euler honesty tax
    (a big step can overshoot through zero — extinction absorbs,
    pinned); mirrored as greatest(0, .).  The interior equilibrium
    survives the integer arithmetic exactly when it is
    representable: with a = b, c = d and x = y = 1e6, growth ==
    predation and starvation == conversion term by term, so the
    fixed point is EXACT and eternal (pinned).  Decoupled pins at
    b = d = 0: prey grows by floored geometric steps, predator
    decays likewise — both chains replayed floor-for-floor in the
    tests."""
    x, y = x0_ppm, y0_ppm
    rows = [(0, x, y)]
    for t in range(1, steps + 1):
        growth = a_ppm * x // 1_000_000
        predation = b_ppm * x * y // 1_000_000_000_000
        starvation = c_ppm * y // 1_000_000
        conversion = d_ppm * x * y // 1_000_000_000_000
        x = max(0, x + growth - predation)
        y = max(0, y - starvation + conversion)
        rows.append((t, x, y))
    out = pd.DataFrame(rows, columns=["t", "prey_ppm", "pred_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def johnson_flowshop_int(jobs: list) -> pd.DataFrame:
    """Johnson's rule for the 2-machine flowshop (1954) — the
    makespan-optimal sequencing theorem, exact integers.  ``jobs``
    is [(name, p1, p2), ...]; Johnson's order runs jobs with
    p1 < p2 FIRST ascending p1, then jobs with p1 >= p2 descending
    p2 (ties by name) — provably minimizing C_max, pinned by brute
    force over all n! orders in the tests.  Completion times are
    the classic recurrences C1_i = C1_{i-1} + p1_i and
    C2_i = max(C2_{i-1}, C1_i) + p2_i; a SQL mirror avoids the fold
    via the prefix/suffix closed form
    C2_j = max_{i<=j}(sum_{k<=i} p1_k + sum_{i<=k<=j} p2_k) —
    algebraically identical (both sides integer, zero floors).
    The alphabetical (FIFO) makespan rides along; Johnson <= FIFO
    by the optimality theorem."""
    def key(j):
        name, p1, p2 = j
        return (0, p1, name) if p1 < p2 else (1, -p2, name)

    seq = sorted(jobs, key=key)

    def fold(order):
        c1 = c2 = 0
        rows = []
        for name, p1, p2 in order:
            c1 += p1
            c2 = max(c2, c1) + p2
            rows.append((name, p1, p2, c1, c2))
        return rows

    rows = fold(seq)
    makespan = rows[-1][4]
    fifo = fold(sorted(jobs, key=lambda j: j[0]))[-1][4]
    out = pd.DataFrame(
        [(i + 1, *r, makespan, fifo)
         for i, r in enumerate(rows)],
        columns=["pos", "job", "p1", "p2", "c1", "c2",
                 "makespan", "fifo_makespan"])
    for c in out.columns:
        if c != "job":
            out[c] = out[c].astype("int64")
    return out


#: Fixed 5-task CPM activity network over the alphabetically-ordered
#: task names (A=1st..E=5th): edges A->C, B->C, A->D, C->E, D->E.
#: Shared with the SQL mirror; the four source-to-sink paths are
#: A-C-E, B-C-E, A-D-E and (B has only the C route).
CPM_EDGES = [(0, 2), (1, 2), (0, 3), (2, 4), (3, 4)]


def critical_path_int(tasks: list, durations: list) -> pd.DataFrame:
    """Critical Path Method (Kelley-Walker 1959) on the fixed 5-task
    network ``CPM_EDGES`` — PROJECT SCHEDULING, exact integers:
    forward pass ES_j = max over predecessors (ES_i + d_i) (longest
    path — dag_layers counts depth, CPM weighs it), project duration
    T = max over sinks of ES + d, backward pass LS_i = min over
    successors LS_j − d_i (sinks: T − d), slack = LS − ES.  The
    classical theorems pinned: slack >= 0 everywhere, the zero-slack
    tasks form a source-to-sink chain realizing T (at least one
    critical path ALWAYS exists), and T equals the explicit max over
    the enumerated path sums.  Zero floors — pure max/min/plus
    algebra both engines replay exactly."""
    n = len(tasks)
    preds = [[i for i, j in CPM_EDGES if j == k] for k in range(n)]
    succs = [[j for i, j in CPM_EDGES if i == k] for k in range(n)]
    es = [0] * n
    for k in range(n):  # tasks are topologically ordered
        if preds[k]:
            es[k] = max(es[i] + durations[i] for i in preds[k])
    total = max(es[k] + durations[k]
                for k in range(n) if not succs[k])
    ls = [0] * n
    for k in range(n - 1, -1, -1):
        if succs[k]:
            ls[k] = min(ls[j] for j in succs[k]) - durations[k]
        else:
            ls[k] = total - durations[k]
    out = pd.DataFrame({
        "task": tasks,
        "duration": durations,
        "es": es,
        "ls": ls,
        "slack": [ls[k] - es[k] for k in range(n)],
        "critical": [ls[k] == es[k] for k in range(n)],
        "project_duration": total})
    for c in ("duration", "es", "ls", "slack", "project_duration"):
        out[c] = out[c].astype("int64")
    return out


def pythagorean_wins_int(teams: list) -> pd.DataFrame:
    """Bill James' Pythagorean expectation — SPORTS ANALYTICS,
    exact rationals: a team scoring S and allowing A is expected to
    win S² / (S² + A²) of its games (exponent 2, the classical
    form).  ``teams`` is [(name, scored, allowed), ...] in integer
    cents; pyth_ppm and actual share cost ONE floor each.  The
    family's identities pinned in tests: S == A reads exactly
    500000, A == 0 reads exactly 10⁶, the estimate is SCALE
    INVARIANT (doubling both S and A multiplies numerator and
    denominator by exactly 4, so even the floor residue is
    unchanged), and the canonical 100-vs-50 instance reads exactly
    800000.  Envelope: 10⁶·S² at S ~ 10¹² cents is ~10³⁰ — HUGEINT
    in the mirror, documented there."""
    rows = []
    for name, s, a in teams:
        denom = s * s + a * a
        pyth = 1_000_000 * s * s // denom if denom else 500_000
        actual = 1_000_000 * s // (s + a) if s + a else 500_000
        rows.append((name, s, a, pyth, actual, pyth - actual))
    out = pd.DataFrame(rows, columns=[
        "team", "scored_cents", "allowed_cents", "pyth_ppm",
        "actual_ppm", "luck_ppm"])
    for c in out.columns:
        if c != "team":
            out[c] = out[c].astype("int64")
    return out


def log5_matchup_int(ratings: list) -> pd.DataFrame:
    """Bill James' log5 rule == the Bradley-Terry pairwise model:
    a p_a team beats a p_b team with probability
    p_a(1-p_b) / (p_a(1-p_b) + p_b(1-p_a)).  ``ratings`` is
    [(name, p_ppm), ...]; one floor per ordered pair (a < b by
    name).  The model's defining identities pinned in tests:
    p_a == p_b reads exactly 500000; against a league-average
    opponent (p_b = 1/2) the matchup probability is p_a EXACTLY
    (numerator p_a·5e5, denominator 5e5·10⁶ — zero floor residue);
    the complement p_ab + p_ba ∈ {10⁶ - 1, 10⁶} (the two floor
    remainders sum to 0 or the denominator — never more than 1 ppm
    of drift); and p_a > p_b ⇒ p_ab > 500000 (monotone).  A doubly
    degenerate pair (both 0 or both 10⁶) reads 500000 by the same
    convention both engines share."""
    rows = []
    rs = sorted(ratings)
    for i in range(len(rs)):
        for j in range(i + 1, len(rs)):
            (na, pa), (nb, pb) = rs[i], rs[j]
            num = pa * (1_000_000 - pb)
            den = num + pb * (1_000_000 - pa)
            p = 1_000_000 * num // den if den else 500_000
            rows.append((na, nb, pa, pb, p))
    out = pd.DataFrame(rows, columns=[
        "team_a", "team_b", "p_a_ppm", "p_b_ppm", "log5_ppm"])
    for c in out.columns:
        if c not in ("team_a", "team_b"):
            out[c] = out[c].astype("int64")
    return out


def _ballot_ranks(cell: pd.DataFrame, voter_col: str, cand_col: str,
                  n_col: str) -> tuple:
    """Strict complete per-voter rankings from a (voter, cand, n)
    census: missing cells count 0, order by (n desc, name asc) — a
    deterministic tie-break BOTH engines share (copeland_int
    abstains on ties instead; Borda/IRV need strict ballots).
    Returns (pivot DataFrame voters x candidates, candidate
    list)."""
    cands = sorted(cell[cand_col].unique())
    pivot = (cell.pivot_table(index=voter_col, columns=cand_col,
                              values=n_col, aggfunc="sum",
                              fill_value=0)
             .reindex(columns=cands, fill_value=0))
    return pivot, cands


def borda_int(cell: pd.DataFrame, *, voter_col: str, cand_col: str,
              n_col: str) -> pd.DataFrame:
    """Borda count (1770) over strict ballots: rank r (1 = first)
    earns k − r points, summed across voters; plurality (first-
    place) tallies ride along because the two rules famously
    DISAGREE (pinned on the canonical divergence profile).  The
    classical guarantee pinned beside it: a Condorcet winner is
    NEVER Borda-last.  Zero floors — pure integer point sums."""
    pivot, cands = _ballot_ranks(cell, voter_col, cand_col, n_col)
    k = len(cands)
    points = {c: 0 for c in cands}
    firsts = {c: 0 for c in cands}
    for _, row in pivot.iterrows():
        order = sorted(cands, key=lambda c: (-row[c], c))
        for r, c in enumerate(order):
            points[c] += k - 1 - r
        firsts[order[0]] += 1
    out = pd.DataFrame({
        "candidate": cands,
        "borda_points": [points[c] for c in cands],
        "plurality_votes": [firsts[c] for c in cands]})
    out = out.sort_values(["borda_points", "candidate"],
                          ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    out["borda_rank"] = range(1, len(out) + 1)
    for c in out.columns:
        if c != "candidate":
            out[c] = out[c].astype("int64")
    return out


def irv_int(cell: pd.DataFrame, *, voter_col: str, cand_col: str,
            n_col: str) -> pd.DataFrame:
    """Instant-runoff voting over the same strict ballots: each
    round tallies first choices among the REMAINING candidates,
    eliminates the minimum (ties by name asc), and repeats — k − 1
    rounds, then the survivor's final (unanimous-by-construction)
    tally.  The elimination order is data-dependent but the round
    COUNT is k − 1, fixed by the candidate census — so a SQL mirror
    of chained per-round CTEs is honest.  IRV's canonical
    pathologies are pinned in tests: it defeats a Condorcet winner
    on Condorcet's own profile, and the textbook monotonicity
    violation (ranking a candidate HIGHER makes them lose) is
    exhibited verbatim.  Zero floors."""
    pivot, cands = _ballot_ranks(cell, voter_col, cand_col, n_col)
    remaining = list(cands)
    rows = []
    rnd = 1
    while len(remaining) > 1:
        tally = {c: 0 for c in remaining}
        for _, row in pivot.iterrows():
            first = min(remaining, key=lambda c: (-row[c], c))
            tally[first] += 1
        out_c = min(remaining, key=lambda c: (tally[c], c))
        rows.append((rnd, out_c, tally[out_c], False))
        remaining.remove(out_c)
        rnd += 1
    winner = remaining[0]
    rows.append((rnd, winner, len(pivot), True))
    out = pd.DataFrame(rows, columns=["round", "candidate",
                                      "votes", "is_winner"])
    for c in ("round", "votes"):
        out[c] = out[c].astype("int64")
    return out


def erlang_c_int(a_micro: int, servers: int = 10) -> pd.DataFrame:
    """Erlang-C delay probability — the DELAY system completing
    erlang_b_int's LOSS system: blocked callers WAIT instead of
    vanishing, and the probability of waiting is

        C_c = c·B_c / (c − a·(1 − B_c))        (c > a, else certain)

    computed as exact chained floors on top of the replayed B
    chain: denom_micro = c·10⁶ − a·(10⁶ − B_ppm) // 10⁶ (1 floor),
    C_ppm = c·10⁶·B_ppm // denom_micro (1 floor), clamped to 10⁶
    for unstable c·10⁶ ≤ a (a queue slower than its arrivals waits
    with certainty).  avg_wait_milli_s = 3000·C_ppm //
    (c·10⁶ − a_micro) for stable rows (3 s hold time — the same
    constant the census uses), 0-clamped otherwise.  The classical
    structure pinned in tests: C ≥ B ALWAYS (a delayed call is at
    least as likely as a lost one — the loss/delay inequality),
    the single-server M/M/1 identity P(wait) = ρ holding within
    ≤ 2 ppm floor drift for stable loads (a = 1 erlang is the
    unstable BOUNDARY and clamps instead — the pin lives at
    a < 1), monotone non-increasing in c, and the unstable
    clamp."""
    base = erlang_b_int(a_micro, servers)
    A = int(a_micro)
    rows = []
    for _, r in base.iterrows():
        c, b = int(r["servers"]), int(r["blocking_ppm"])
        if c * 10**6 <= A:
            cw, wait = 10**6, 0
        else:
            denom = c * 10**6 - A * (10**6 - b) // 10**6
            cw = min(10**6, c * 10**6 * b // denom)
            wait = 3000 * cw // (c * 10**6 - A)
        rows.append({"servers": c, "a_micro": A,
                     "blocking_ppm": b, "wait_prob_ppm": cw,
                     "avg_wait_milli_s": wait,
                     "stable": c * 10**6 > A})
    out = pd.DataFrame(rows)
    for c in ("servers", "a_micro", "blocking_ppm",
              "wait_prob_ppm", "avg_wait_milli_s"):
        out[c] = out[c].astype("int64")
    return out


def mm1_metrics_int(rho_ppm: int) -> pd.DataFrame:
    """M/M/1 queue closed forms (3 s service) — the single-server
    laws every queueing course opens with, exact rationals of the
    utilization ρ:

        l_milli      = 1000·ρ // (10⁶ − ρ)          (L = ρ/(1−ρ))
        lq_milli     = 1000·ρ² // (10⁶·(10⁶ − ρ))   (Lq = ρ²/(1−ρ))
        w_milli_s    = 3·10⁹ // (10⁶ − ρ)           (W = h/(1−ρ))
        wq_milli_s   = 3000·ρ // (10⁶ − ρ)          (Wq = ρh/(1−ρ))
        p_gt10_ppm   = ρ¹¹ as 10 chained ppm floors (P(N > 10))

    one floor each (the power chain one per step).  ρ = 1/2 is the
    dyadic textbook row — L = 1.000, Lq = 0.500, W = 6.000 s,
    Wq = 3.000 s, EXACT (pinned); W = Wq + 3000 exactly whenever
    (10⁶ − ρ) | residues cancel — pinned as W − Wq == 3000 for the
    dyadic case and W ≥ Wq + 2999 generally (floor drift ≤ 1).
    ρ ≥ 10⁶ raises — an unstable M/M/1 has no stationary law."""
    r = int(rho_ppm)
    if r >= 10**6:
        raise ValueError("unstable: rho >= 1")
    p = r
    for _ in range(10):
        p = p * r // 10**6
    out = pd.DataFrame([{
        "rho_ppm": r,
        "l_milli": 1000 * r // (10**6 - r),
        "lq_milli": 1000 * r * r // (10**6 * (10**6 - r)),
        "w_milli_s": 3 * 10**9 // (10**6 - r),
        "wq_milli_s": 3000 * r // (10**6 - r),
        "p_gt10_ppm": p}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _anova_floors(groups: list) -> tuple:
    """Shared one-way ANOVA integer fold over per-group moment
    triples [(n_i, S_i, Q_i)] (count, sum, sum-of-squares in integer
    units).  The sums-of-squares clear to integers with ONE floor per
    group plus one grand floor (the cross-engine contract — DuckDB
    mirrors the same ``//``):

        SSW = Q − Σ_i (S_i² // n_i)        (k floors)
        SST = Q − S² // N                  (1 floor)
        SSB = max(0, SST − SSW)

    True SSB ≥ 0 always (the variance decomposition), but the k
    per-group floor losses can push the floored difference a hair
    below zero near SSB = 0 — hence the clamp (the kruskal_wallis_int
    lesson).  F = (SSB/(k−1)) / (SSW/(N−k)) lands as ONE more floor
    at milli; the degenerate SSW == 0 reports the certainty cap 10⁹
    when SSB > 0 (groups are distinct constants — infinite F) and 0
    when SSB == 0 too (every value identical).  eta² = SSB/SST at
    ppm, one floor.  Envelope: 1000·SSB·N ≲ 1000·N²·c²_max ~ 4·10³⁵
    at N = 10¹², c = 2·10⁴ cents — HUGEINT in the mirror.  Location
    invariance is EXACT including floor residue: shifting every
    value by d moves S_i to S_i + d·n_i, and (S_i + d·n_i)² // n_i
    = S_i² // n_i + 2·d·S_i + d²·n_i exactly (the added terms are
    divisible by n_i), so SSW/SST/SSB/F never move — pinned in
    tests."""
    k = len(groups)
    nn = sum(n for n, _, _ in groups)
    ss = sum(s for _, s, _ in groups)
    qq = sum(q for _, _, q in groups)
    sw = sum(s * s // n for n, s, _ in groups)
    ssw = qq - sw
    sst = qq - ss * ss // nn
    ssb = sst - ssw
    if ssb < 0:
        ssb = 0
    if ssw > 0 and k > 1:
        f_milli = 1000 * ssb * (nn - k) // (ssw * (k - 1))
    else:
        f_milli = 1_000_000_000 if ssb > 0 else 0
    eta2 = 1_000_000 * ssb // sst if sst > 0 else 0
    return ssb, ssw, sst, f_milli, eta2


def anova_oneway_int(moments: list) -> pd.DataFrame:
    """One-way fixed-effects ANOVA (Fisher 1925) — the PARAMETRIC
    variance-decomposition test the rank matrix (KW / Friedman /
    Page / Cochran-Armitage) deliberately avoids: it partitions the
    total sum of squares of the raw values (not ranks) into between-
    group and within-group parts and compares their mean squares.
    ``moments`` is [(name, n_i, S_i, Q_i)] in integer cents; the
    whole fold is ``_anova_floors``'s k + 2 floors plus one
    mean-cents floor per group.  Returns one row per group (n_grp,
    sum_cents, mean_cents) with the scalar ssb_c2 / ssw_c2 / f_milli
    / eta2_ppm repeated on every row (the kruskal_wallis_int output
    shape)."""
    ssb, ssw, _sst, f_milli, eta2 = _anova_floors(
        [(n, s, q) for _, n, s, q in moments])
    rows = [(name, n, s, s // n) for name, n, s, q in moments]
    out = pd.DataFrame(rows, columns=[
        "grp", "n_grp", "sum_cents", "mean_cents"])
    out["ssb_c2"] = ssb
    out["ssw_c2"] = ssw
    out["f_milli"] = f_milli
    out["eta2_ppm"] = eta2
    for c in out.columns:
        if c != "grp":
            out[c] = out[c].astype("int64")
    return out.sort_values("grp").reset_index(drop=True)


def brown_forsythe_int(hist: pd.DataFrame, *, grp_col: str,
                       val_col: str, n_col: str = "n") -> pd.DataFrame:
    """Brown-Forsythe test (1974) — Levene's dispersion test with
    the MEDIAN center, the parametric-family companion ANOVA can't
    replace: ANOVA asks whether group MEANS differ, Brown-Forsythe
    runs the same F machinery on absolute deviations from each
    group's median, asking whether group SPREADS differ (the classic
    differential pair is pinned in tests: equal-mean unequal-spread
    groups give ANOVA F ≈ 0 and BF F large).  Ties and even counts
    stay integral with DOUBLED units: med2 = lo + hi (the two middle
    order statistics; equal when n is odd), z = |2·value − med2| —
    so z is exact and the fold is ``_anova_floors`` on the z
    moments, zero extra flooring.  Works from the bounded
    (group, value) → count histogram (the matching_att /
    kruskal_wallis census discipline); the medians come from window
    cumsums over that histogram, never from row order.  Location
    invariance is EXACT (med2 shifts by 2d, every z unchanged).
    Returns one row per group (n_grp, med2, sum_zdev) with
    ssb_z2 / ssw_z2 / bf_milli repeated."""
    rows = []
    for grp, g in hist.groupby(grp_col):
        g = g.sort_values(val_col)
        ns = g[n_col].astype(int).to_numpy()
        vs = g[val_col].astype(int).to_numpy()
        nt = int(ns.sum())
        cum = ns.cumsum()
        lo = int(vs[int(np.searchsorted(cum, (nt + 1) // 2))])
        hi = int(vs[int(np.searchsorted(cum, nt // 2 + 1))])
        med2 = lo + hi
        z = np.abs(2 * vs - med2)
        sz = int((ns * z).sum())
        qz = int((ns.astype(object) * (z.astype(object) ** 2)).sum())
        rows.append((grp, nt, med2, sz, qz))
    ssb, ssw, _sst, bf_milli, _eta2 = _anova_floors(
        [(n, sz, qz) for _, n, _, sz, qz in rows])
    out = pd.DataFrame(
        [(g, n, m, sz) for g, n, m, sz, _ in rows],
        columns=["grp", "n_grp", "med2_cents", "sum_zdev"])
    out["ssb_z2"] = ssb
    out["ssw_z2"] = ssw
    out["bf_milli"] = bf_milli
    for c in out.columns:
        if c != "grp":
            out[c] = out[c].astype("int64")
    return out.sort_values("grp").reset_index(drop=True)


def h_g_index_fold(df: pd.DataFrame) -> pd.DataFrame:
    """BIBLIOMETRICS fold: Hirsch's h-index (2005), Egghe's g-index
    (2006) and the i10 count per author, computed from the bounded
    (author, citations) → count histogram — never from row order and
    never by materializing one row per paper.  Level algebra (cit
    levels t descending, within author): m(t) = Σ papers with cit ≥
    t, S(t) = their citation sum.  h = max_t min(t, m(t)) — equal to
    the classic "largest k with c_(k) ≥ k" because min(t, m(t)) = v
    forces c_(v) ≥ v, and t = c_(h) realizes h.  g = largest g with
    (top-g citation sum) ≥ g²: within a level's range the top-g sum
    is S − (m − g)·t, so g_level = ⌊(t + √(t² + 4(S − t·m)))/2⌋
    clamped to m; the discriminant is ≥ t² because S ≥ t·m, and the
    float sqrt is integer-corrected by exact fixup passes.  The
    formula is exact ONLY inside the level's own rank range
    (m_prev, m] — below it the removed papers are worth ≥ t each, so
    S − (m − g)·t OVERestimates and the candidate must be DISCARDED
    (every g lands in exactly one level's range, where it is scored
    exactly, so the max over in-range candidates is the true g —
    the off-by-one this guard fixes was caught by the cross-check
    oracle on real data).  The
    theorem g ≥ h (Egghe) and the zero-cited-paper law (h fixed, g
    non-decreasing) are pinned in tests against a brute-force
    ranked-cumsum oracle — the SQL mirror deliberately uses THAT
    other algorithm (row_number + cumsum windows), making the query
    a first-principles cross-check rather than a mirror of itself."""
    df = df.sort_values(["author", "cit"],
                        ascending=[True, False]).reset_index(drop=True)
    df["w"] = df["cit"] * df["n"]
    grp = df.groupby("author", sort=False)
    m = grp["n"].cumsum().to_numpy()
    cit = df["cit"].to_numpy()
    n = df["n"].to_numpy()
    s = (grp[["w"]].cumsum()["w"]).to_numpy()
    a = s - cit * m
    disc = cit * cit + 4 * a
    r = np.floor(np.sqrt(disc.astype("float64"))).astype("int64")
    for _ in range(3):   # exact integer correction of the float root
        over = r * r > disc
        under = (r + 1) * (r + 1) <= disc
        if not (over.any() or under.any()):
            break
        r = np.where(over, r - 1, np.where(under, r + 1, r))
    assert not ((r * r > disc) | ((r + 1) * (r + 1) <= disc)).any()
    h_cand = np.minimum(cit, m)
    g_cand = np.minimum((cit + r) // 2, m)
    g_cand = np.where(g_cand > m - n, g_cand, 0)
    out = pd.DataFrame({
        "author": df["author"],
        "_h": h_cand, "_g": g_cand,
        "_n": n, "_w": df["w"],
        "_i10": np.where(cit >= 10, n, 0)})
    agg = out.groupby("author", as_index=False).agg(
        n_papers=("_n", "sum"), total_cits=("_w", "sum"),
        h_index=("_h", "max"), g_index=("_g", "max"),
        i10=("_i10", "sum"))
    for c in agg.columns:
        if c != "author":
            agg[c] = agg[c].astype("int64")
    return agg


def acceptance_sampling_int(p_rows: list, *, n: int = 10, c: int = 2,
                            lot: int = 1000) -> pd.DataFrame:
    """Dodge-Romig single-sampling acceptance plan — STATISTICAL
    QUALITY CONTROL's lot-disposition face, which the control-chart
    suite (cusum_alarms, xmr_alarms) doesn't cover: inspect n items
    from the lot, accept iff defects ≤ c.  At lot quality p (milli),
    P(accept) = Σ_{d≤c} C(n,d) p^d q^(n−d) / 1000^n — EXACT integer
    binomials (math.comb, q = 1000 − p), one ppm floor per row;
    1000^10 = 10³⁰ and the largest term ≤ 45·10³⁰ sit inside
    HUGEINT (~1.7·10³⁸) with room, which is why the contract fixes
    per-MILLE quality and n = 10 (ppm quality at n = 10 would need
    10⁶⁰).  AOQ = p·Pa (the rectifying-inspection outgoing quality,
    one floor) and ATI = n + (1 − Pa)(N − n) at N = ``lot`` (one
    floor) ride along.  ``p_rows`` is [(p_milli, is_observed)].
    The OC curve's laws pinned in tests: Pa(0) = 10⁶ EXACTLY,
    strictly decreasing in p, and the dyadic p = 1/2 row reads
    exactly ⌊56·10⁶/1024⌋ = 54687 ppm (the three binomial terms
    collapse to (1+10+45)/2¹⁰).  Mirror: the same three explicit
    product terms per row under HUGEINT."""
    import math
    rows = []
    for p, obs in p_rows:
        q = 1000 - p
        num = sum(math.comb(n, d) * p ** d * q ** (n - d)
                  for d in range(c + 1))
        pa = 1_000_000 * num // 1000 ** n
        aoq = p * pa // 1000
        ati = 1000 * n + (lot - n) * (1_000_000 - pa) // 1000
        rows.append((p, bool(obs), pa, aoq, ati))
    out = pd.DataFrame(rows, columns=[
        "p_milli", "is_observed", "pa_ppm", "aoq_ppm", "ati_milli"])
    for col in ("p_milli", "pa_ppm", "aoq_ppm", "ati_milli"):
        out[col] = out[col].astype("int64")
    return out


def loan_amortization_int(p_cents: int, *, i_ppm: int = 10_000,
                          n: int = 12) -> pd.DataFrame:
    """Level-payment loan amortization — CONSUMER FINANCE's founding
    schedule, a family the surface lacked (chain_ladder reserves,
    fifo_cogs costs inventory, but nothing prices money over time):
    a principal P at monthly rate i for n months pays the annuity
    A = P·i·(1+i)ⁿ / ((1+i)ⁿ − 1), and the schedule splits each
    payment into interest (on the running balance) and principal.
    Integer contract: the accumulation factor f = (1+i)ⁿ is an
    n-step ppm chain (one floor per step — the mm1/erlang chain
    discipline), A = P·i·f // (10⁶·(f − 10⁶)) one more floor, each
    month's interest = balance·i // 10⁶ one floor, and the LAST
    payment settles the exact residual (balance + interest) so the
    final balance is 0 EXACTLY and Σ principal == P exactly — the
    two invariants pinned in tests, beside a Fraction cross-check
    of A (the 12 chain floors cost ≤ 12 ppm of f, cents-scale
    drift) and the zero-rate edge (A = P // n, remainder in the
    last payment).  Mirror: the same two WITH RECURSIVE chains of
    data-independent length (12 power steps, 12 schedule steps)."""
    if i_ppm == 0:
        rows = []
        bal = p_cents
        for m in range(1, n + 1):
            princ = p_cents // n if m < n else bal
            bal -= princ
            rows.append((m, princ, 0, princ, bal))
    else:
        f = 1_000_000
        for _ in range(n):
            f = f * (1_000_000 + i_ppm) // 1_000_000
        a = p_cents * i_ppm * f // (1_000_000 * (f - 1_000_000))
        rows = []
        bal = p_cents
        for m in range(1, n + 1):
            intr = bal * i_ppm // 1_000_000
            if m < n:
                pay, princ = a, a - intr
            else:
                pay, princ = bal + intr, bal
            bal -= princ
            rows.append((m, pay, intr, princ, bal))
    out = pd.DataFrame(rows, columns=[
        "month", "payment_cents", "interest_cents",
        "principal_cents", "balance_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def nw_transport_int(supplies: list, demands: list) -> pd.DataFrame:
    """Northwest-corner initial solution of the balanced
    TRANSPORTATION PROBLEM — classical OR's tableau opener, a family
    the surface lacked (optimal_assignment matches 1:1, waterfill
    allocates a single budget; moving Σ supply across a supply ×
    demand tableau is neither): walk from the NW cell, allocate
    min(remaining supply, remaining demand), advance the exhausted
    side (both on a tie — degenerate zero cells are skipped, so the
    positive-cell set is convention-independent).  ``supplies`` and
    ``demands`` are [(name, qty)] with EQUAL totals (asserted).
    The fold has a CLOSED FORM the mirror uses instead — the
    interval-overlap identity alloc(i,j) = max(0, min(CS_i, CD_j) −
    max(CS_{i−1}, CD_{j−1})) on the cumulative totals — making the
    query a two-algorithm cross-check (walk vs overlap), pinned
    cell-for-cell on seeded draws in tests.  Unit cost is
    |i − j| + 1 (tableau band distance); positive cells number at
    most m + n − 1 (the basic-solution theorem, pinned).  Zero
    floors anywhere.  Returns positive cells + the total cost
    repeated on every row."""
    assert sum(q for _, q in supplies) == sum(q for _, q in demands)
    m, n = len(supplies), len(demands)
    i = j = 0
    s_rem = [int(q) for _, q in supplies]
    d_rem = [int(q) for _, q in demands]
    cells = []
    while i < m and j < n:
        a = min(s_rem[i], d_rem[j])
        if a > 0:
            cells.append((i, j, a))
        s_rem[i] -= a
        d_rem[j] -= a
        if s_rem[i] == 0 and i < m - 1:
            i += 1
        elif d_rem[j] == 0:
            j += 1
        else:
            i += 1  # last supply row, drain remaining demands
    total = sum(a * (abs(i - j) + 1) for i, j, a in cells)
    out = pd.DataFrame(
        [(supplies[i][0], demands[j][0], i + 1, j + 1, a,
          abs(i - j) + 1, a * (abs(i - j) + 1), total)
         for i, j, a in cells],
        columns=["src", "dst", "src_pos", "dst_pos", "alloc",
                 "unit_cost", "cell_cost", "total_cost"])
    for c in out.columns:
        if c not in ("src", "dst"):
            out[c] = out[c].astype("int64")
    return out


def hardy_weinberg_int(n_dom: int, n_het: int, n_rec: int) -> pd.DataFrame:
    """Hardy-Weinberg equilibrium test (1908) — POPULATION GENETICS,
    a family the surface lacked: chi2_independence tests a 2-way
    table, but HWE asks a one-sample question with an ESTIMATED null
    (are genotype frequencies the p², 2pq, q² of their own allele
    counts?) and owns two constants of its own.  Inputs are genotype
    counts (dominant-homozygote, heterozygote, recessive); allele
    counts n_A = 2·n_dom + n_het, n_a = 2·n_rec + n_het.  The χ²
    uses the classical CLOSED FORM χ² = N·(4·n_dom·n_rec − n_het²)²
    / (n_A²·n_a²) — pinned ALGEBRAICALLY equal to Σ(O−E)²/E by a
    Fraction sweep in tests — as ONE milli floor; Wright's
    inbreeding coefficient F = 1 − 2N·n_het/(n_A·n_a) as one more
    (the divided term is non-negative, so floor == trunc — no
    sign-split needed), with the identity χ² = N·F² checked at
    Fraction exactness in tests.  The 5% flag cross-multiplies in
    micro units: 10⁶·N·K² < 3841459·n_A²·n_a².  Monomorphic lots
    (n_A or n_a = 0) report χ² = 0, F = 0, in-equilibrium by
    convention — stated, not hidden.  Envelope: 1000·N·K² ≲
    1.6·10⁴·N⁵ caps N at ~5·10⁶ subjects inside HUGEINT —
    documented; the census is user-bounded."""
    nn = n_dom + n_het + n_rec
    n_a_ = 2 * n_dom + n_het
    n_b = 2 * n_rec + n_het
    if n_a_ == 0 or n_b == 0 or nn == 0:
        chi2, f, ok = 0, 0, True
        p = 1_000_000 if (n_a_ > 0) else 0
    else:
        k = 4 * n_dom * n_rec - n_het * n_het
        chi2 = 1000 * nn * k * k // (n_a_ * n_a_ * n_b * n_b)
        f = 1000 - 2000 * nn * n_het // (n_a_ * n_b)
        ok = 1_000_000 * nn * k * k < 3_841_459 * n_a_ * n_a_ * n_b * n_b
        p = 1_000_000 * n_a_ // (2 * nn)
    out = pd.DataFrame([{
        "n_subjects": nn, "n_dom": n_dom, "n_het": n_het,
        "n_rec": n_rec, "p_ppm": p, "chi2_milli": chi2,
        "f_milli": f, "hw_ok": bool(ok)}])
    for c in out.columns:
        if c != "hw_ok":
            out[c] = out[c].astype("int64")
    return out


def portfolio_minvar_int(n: int, sx: int, sy: int, sxx: int,
                         syy: int, sxy: int) -> pd.DataFrame:
    """Two-asset minimum-variance portfolio (Markowitz 1952) —
    PORTFOLIO THEORY's closed-form cornerstone, a family the surface
    lacked (leadlag_beta regresses one series on another; choosing
    the weight that minimizes combined variance is the allocation
    question).  All second moments clear by n²: V_x = n·Σx² − (Σx)²,
    V_y likewise, C = n·Σxy − Σx·Σy (exact integers), and the
    optimal weight w* = (V_y − C)/(V_x + V_y − 2C) lands as ONE
    sign-split ppm floor (the numerator CAN be negative — shorting
    asset x — and the denominator is n²·Var(x−y) ≥ 0, zero iff
    x − y is constant, which reports the 500000 convention).  The
    portfolio variance at the floored weight, P = (w²V_x +
    (10⁶−w)²V_y + 2w(10⁶−w)C) // 10¹², is non-negative for ANY
    integer w because it is 10¹²·n²·σ²_p(w/10⁶) — a true variance —
    so the floor never needs a sign split (stated, because the
    cross term alone can be negative).  Theorems pinned in tests:
    w = 500000 exactly for symmetric assets, w = V_y/(V_x+V_y) for
    uncorrelated ones, P ≤ min(V_x, V_y) (diversification never
    hurts at the minimum), and discrete optimality P(w) ≤ P(w ±
    1000 ppm) on seeded draws.  Mirror: the same moments and floors
    under HUGEINT."""
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    c = n * sxy - sx * sy
    den = vx + vy - 2 * c
    w = 500_000 if den == 0 else _ss_scaled(vy - c, den, 1_000_000)
    port = (w * w * vx + (1_000_000 - w) * (1_000_000 - w) * vy
            + 2 * w * (1_000_000 - w) * c) // 10 ** 12
    out = pd.DataFrame([{
        "n_hours": n, "var_x_n2": vx, "var_y_n2": vy,
        "cov_xy_n2": c, "w_min_ppm": w, "port_var_n2": port}])
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out


def naive_bayes_int(cells: pd.DataFrame, *, v_h: int = 24,
                    v_v: int = 10) -> pd.DataFrame:
    """Naive Bayes classification with EXACT integer scores —
    GENERATIVE classification, a family the engine-side ML stage
    (TF-IDF+LR actor pool) covers only approximately and no oracle
    query covered at all: resubstitution-classify every (hour,
    value-bucket) cell by the class maximizing prior × the two
    Laplace-smoothed likelihoods.  ``cells`` is the bounded
    (cls, h, v) → count census (≤ |classes|·24·10 cells — the whole
    training set and test grid in ONE exchange; marginals are sums
    over it).  The score contract is the FLOORED canonical integer
    q = 10¹²·n_c·(n_ch+1)·(n_cv+1) // ((n_c+V_h)·(n_c+V_v)) — both
    engines floor identically, so the argmax (ties by class name)
    is deterministic cross-engine; with small-count data the
    rational gap between distinct classes is ≥ 1/(den·den') and the
    10¹² scale cannot flip it (pinned by a Fraction argmax sweep in
    tests).  Envelope: 10¹²·n³ caps per-class counts at ~5·10⁸
    inside HUGEINT — documented.  Returns the confusion matrix
    (actual, predicted, n_events) with accuracy_ppm repeated."""
    nc = cells.groupby("cls")["n"].sum().to_dict()
    nh = cells.groupby(["cls", "h"])["n"].sum().to_dict()
    nv = cells.groupby(["cls", "v"])["n"].sum().to_dict()
    classes = sorted(nc)
    pred = {}
    for h, v in sorted({(h, v) for h, v in
                        zip(cells["h"], cells["v"])}):
        best = None
        for c in classes:
            num = nc[c] * (nh.get((c, h), 0) + 1) \
                * (nv.get((c, v), 0) + 1)
            den = (nc[c] + v_h) * (nc[c] + v_v)
            q = 10 ** 12 * num // den
            if best is None or q > best[0]:
                best = (q, c)
        pred[(h, v)] = best[1]
    conf = {}
    for cls, h, v, n in zip(cells["cls"], cells["h"], cells["v"],
                            cells["n"]):
        key = (cls, pred[(h, v)])
        conf[key] = conf.get(key, 0) + int(n)
    total = sum(conf.values())
    hits = sum(n for (a, p), n in conf.items() if a == p)
    acc = 1_000_000 * hits // total if total else 0
    out = pd.DataFrame(
        [(a, p, n, acc) for (a, p), n in sorted(conf.items())],
        columns=["actual", "predicted", "n_events", "accuracy_ppm"])
    for c in ("n_events", "accuracy_ppm"):
        out[c] = out[c].astype("int64")
    return out


def lin_ccc_int(n: int, sx: int, sy: int, sxx: int, syy: int,
                sxy: int) -> pd.DataFrame:
    """Lin's concordance correlation coefficient (1989) — the
    CONTINUOUS-measurement member the agreement suite lacked
    (Cohen / Fleiss / McNemar / Cochran's Q / KR-20 are all
    categorical): two methods measuring the same subjects agree at
    CCC = 2·Cov / (Var_x + Var_y + (mean_x − mean_y)²), which
    punishes both scatter AND the location/scale shifts plain
    correlation forgives.  Everything clears by n²: V_x, V_y, C as
    usual and the mean-shift term is exactly (Σx − Σy)², so the
    whole statistic is ONE sign-split ppm floor (negative CCC =
    systematic discordance).  Degenerate den = 0 (both series the
    same constant) reports perfect agreement 10⁶ by convention.
    Identities pinned in tests: x == y reads EXACTLY 10⁶ (num ==
    den, zero floor residue); a pure shift y = x + d reads exactly
    ⌊10⁶·2V/(2V + n²d²)⌋ (the penalty formula); symmetry
    CCC(x,y) == CCC(y,x) bit-exact; |CCC| ≤ 10⁶ (Cauchy-Schwarz
    through the shift term).  Mirror: the same moments under
    HUGEINT."""
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    c = n * sxy - sx * sy
    d2 = (sx - sy) * (sx - sy)
    den = vx + vy + d2
    ccc = 1_000_000 if den == 0 else _ss_scaled(2 * c, den,
                                                1_000_000)
    out = pd.DataFrame([{
        "n_hours": n, "var_x_n2": vx, "var_y_n2": vy,
        "cov_xy_n2": c, "dmean2_n2": d2, "ccc_ppm": ccc}])
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out


def engset_int(m_sources: int, alpha_micro: int,
               servers: int = 10) -> pd.DataFrame:
    """Engset blocking (1918) — the FINITE-SOURCE member completing
    the teletraffic ladder (Erlang-B assumes infinitely many
    callers; a crawl fleet has exactly M workers, and a busy worker
    can't offer new load): with per-idle-source intensity α, the
    time congestion follows the Erlang-like recursion

        E_0 = 1
        E_i = (M−i+1)·α·E_{i−1} / (i + (M−i+1)·α·E_{i−1})

    (derived from the truncated binomial state law T_i =
    T_{i−1}·(M−i+1)·α/i in the kernel's own docstring — not taken
    on faith), replayed as the erlang_b_int chain discipline: ONE
    ppm floor per step, X = (M−i+1)·α_micro·E'_ppm then E_ppm =
    10⁶·X // (i·10¹² + X), with E = 0 exactly once i > M (more
    servers than sources NEVER block — the structural zero, not a
    convention).  The infinite-source Erlang-B chain at the same
    total offered load A = M·α rides along in erlangb_ppm, because
    the family's defining theorem is the comparison: FINITE sources
    block LESS (busy sources stop offering), pinned exactly in
    Fraction arithmetic and within floor drift on the chain, along
    with M → ∞ convergence to Erlang-B and monotone decrease in
    c."""
    a2 = m_sources * alpha_micro
    rows = []
    e = 10**6
    b = 10**6
    for c in range(1, int(servers) + 1):
        coef = (m_sources - c + 1) * alpha_micro
        if coef <= 0:
            e = 0
        else:
            x = coef * e
            e = 10**6 * x // (c * 10**12 + x)
        numb = 10**6 * a2 * b
        denb = c * 10**12 + a2 * b
        b = numb // denb if denb > 0 else 0
        rows.append({"servers": c, "m_sources": m_sources,
                     "alpha_micro": alpha_micro,
                     "engset_ppm": e, "erlangb_ppm": b})
    out = pd.DataFrame(rows)
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out


def kelly_int(p_ppm: int, odds_milli: list) -> pd.DataFrame:
    """Kelly criterion (1956) — BET SIZING, a family the surface
    lacked (cost_threshold picks an operating point, newsvendor
    stocks one period; "what FRACTION of the bankroll to stake at
    odds b when the win probability is p" is neither): f* =
    (b·p − q)/b, the log-growth-optimal stake, fully rational so
    the whole table is exact integers.  Per odds row: edge =
    (b_milli·p_ppm − 1000·q_ppm) // 1000 and kelly = the same
    numerator // b_milli — both SIGN-SPLIT truncations (a negative
    edge is the famous 'no bet' region, bet = false).  The famous
    pins: fair coin at even odds (p = 1/2, b = 1) stakes EXACTLY 0;
    the textbook p = 0.6, b = 1 stakes exactly 20%; f < p always
    (never stake more than your win probability at positive q);
    monotone in both p and b."""
    q = 1_000_000 - p_ppm
    rows = []
    for b in odds_milli:
        num = b * p_ppm - 1000 * q
        edge = _ss_scaled(num, 1000, 1)
        kelly = _ss_scaled(num, b, 1)
        rows.append({"odds_milli": b, "p_ppm": p_ppm,
                     "edge_ppm": edge, "kelly_ppm": kelly,
                     "bet": kelly > 0})
    out = pd.DataFrame(rows)
    for col in ("odds_milli", "p_ppm", "edge_ppm", "kelly_ppm"):
        out[col] = out[col].astype("int64")
    return out


def airport_game_int(costs: list) -> pd.DataFrame:
    """Airport-game Shapley value (Littlechild-Owen 1973) —
    COOPERATIVE COST ALLOCATION, a family the surface lacked:
    banzhaf_power and shapley_shubik measure VOTING power, but
    "players share a runway each needs a different length of; who
    pays what" is the cost-sharing question, and the airport game
    is the rare cooperative game whose Shapley value has a CLOSED
    FORM: sort requirements c₁ ≤ … ≤ cₙ (ties by name), split each
    increment d_j = c_j − c_{j−1} equally among the n − j + 1
    players who need it, φ_i = Σ_{j≤i} d_j // (n−j+1).  One floor
    per increment (computed once, shared by all payers of that
    increment); the flooring residue c_n − Σφ is reported as
    unallocated_cents — honest accounting, never hidden.  Axioms
    pinned in tests: efficiency up to the reported residue (exact
    on evenly-divisible instances), the dummy axiom (zero
    requirement pays zero), symmetry (equal requirements pay
    equal), stand-alone rationality φ_i ≤ c_i (each increment is
    shared, never inflated), and monotonicity φ_i ≤ φ_{i+1}.
    Mirror: sorted CTE + lag increments + a j ≤ i window sum — no
    recursion."""
    rows = sorted((int(c), str(nm)) for nm, c in costs)
    n = len(rows)
    shares = []
    prev = 0
    for j, (c, _nm) in enumerate(rows):
        shares.append((c - prev) // (n - j))
        prev = c
    out_rows = [(nm, i + 1, c, sum(shares[: i + 1]))
                for i, (c, nm) in enumerate(rows)]
    residue = (rows[-1][0] if rows else 0) - sum(
        (n - j) * s for j, s in enumerate(shares))
    out = pd.DataFrame(out_rows, columns=[
        "player", "rank_pos", "cost_cents", "phi_cents"])
    out["total_allocated"] = sum(out["phi_cents"])
    out["unallocated_cents"] = residue
    for c in out.columns:
        if c != "player":
            out[c] = out[c].astype("int64")
    return out


def stoploss_layers_int(hist: list, layers: list,
                        n_total: int) -> pd.DataFrame:
    """Excess-of-loss layer pricing — REINSURANCE actuarial math, a
    family the surface lacked (chain_ladder reserves what already
    happened; a layer premium prices what MIGHT): the pure premium
    of layer (d, d+w] is E[min(w, (X−d)⁺)], an exact integer sum
    over the bounded value histogram, floored ONCE per layer to a
    per-event expectation.  ``hist`` is [(cents, n)], ``layers``
    [(attach, width)].  The family's defining identity is LAYER
    ADDITIVITY — contiguous layers covering [0, top] sum to
    E[min(X, top)] EXACTLY before the per-layer floor (pinned in
    tests as an exact equality on the raw sums, and within one
    cent per layer after flooring) — alongside monotone decrease
    in the attachment point and the empty-layer zero."""
    rows = []
    for d, w in layers:
        tot = sum(n * min(w, max(0, c - d)) for c, n in hist)
        rows.append((d, w, tot,
                     tot // n_total if n_total else 0))
    out = pd.DataFrame(rows, columns=[
        "attach_cents", "width_cents", "layer_loss_cents",
        "premium_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def mg1_pk_int(hist: list, rho_permille: list) -> pd.DataFrame:
    """Pollaczek-Khinchine mean-wait formula (1930) — the M/G/1
    rung of the teletraffic ladder, the one that makes the SERVICE
    DISTRIBUTION itself the data: mm1/erlang_b/erlang_c/engset all
    assume exponential service, but PK prices a GENERAL service law
    through its first two moments, Wq = ρ·E[S²] / (2(1−ρ)·E[S]) —
    and here the service law IS the empirical value histogram
    (cents read as milliseconds), so the corpus's own variance sets
    the queue.  Exact integer contract: n, S1 = Σc·n, S2 = Σc²·n
    are exact sums over the bounded histogram; per grid utilization
    r‰, wq_pk_micro = 1000·r·S2 // (2·(1000−r)·S1) — ONE floor,
    all-positive so floor == trunc (stated).  Carried beside it,
    the SAME formula under the two textbook laws at the same mean:
    exponential (E[S²] = 2E[S]², wq_exp = 1000·r·S1 //
    ((1000−r)·n)) and deterministic (E[S²] = E[S]², wq_det = half
    of exp) — the family's defining VARIANCE-MATTERS theorem,
    deterministic service waits exactly HALF the exponential wait
    (pre-floor exact; post-floor wq_exp − 2·wq_det ∈ {0,1}, pinned)
    and the empirical wait sits wherever the squared coefficient of
    variation puts it: Wq = (1+cs²)/2 · Wq_exp (the PK blend,
    pinned in Fractions).  scv_ppm = 10⁶(n·S2 − S1²) // S1² (≥ 0
    by Cauchy-Schwarz, so floor == trunc) and the INSPECTION
    PARADOX column lbias_ppm = 10⁶·n·S2 // S1² — the length-biased
    mean over the mean, ≥ 10⁶ always, and == scv_ppm + 10⁶ EXACTLY
    post-floor (adding an exact multiple of the denominator
    commutes with the floor — pinned).  Degenerate all-zero
    service: every wait 0, scv 0, lbias 10⁶ (convention, stated).
    Unstable r ≥ 1000 raises.  Envelope: 10⁶·n·S2 ≤ 10⁶·n²·c²max
    caps n at ~2·10¹¹ events inside HUGEINT — documented."""
    n = sum(int(m) for _, m in hist)
    s1 = sum(int(c) * int(m) for c, m in hist)
    s2 = sum(int(c) * int(c) * int(m) for c, m in hist)
    rows = []
    for r in rho_permille:
        r = int(r)
        if r >= 1000:
            raise ValueError(f"unstable utilization {r} permille")
        if s1 == 0:
            rows.append((r, 0, 0, 0, 0, 1_000_000))
            continue
        wq_pk = 1000 * r * s2 // (2 * (1000 - r) * s1)
        wq_exp = 1000 * r * s1 // ((1000 - r) * n)
        wq_det = 1000 * r * s1 // (2 * (1000 - r) * n)
        scv = 1_000_000 * (n * s2 - s1 * s1) // (s1 * s1)
        lbias = 1_000_000 * n * s2 // (s1 * s1)
        rows.append((r, wq_pk, wq_exp, wq_det, scv, lbias))
    out = pd.DataFrame(rows, columns=[
        "rho_permille", "wq_pk_micro", "wq_exp_micro",
        "wq_det_micro", "scv_ppm", "lbias_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# CRR design constants (u = 5/4, d = 4/5, r = 0, N = 10 steps):
# risk-neutral q = (1-d)/(u-d) = 4/9; terminal price S_k =
# S0·(25/16)^(k-5) = S0·25^k·16^(10-k) / P_DEN; weight numerators
# W_k = C(10,k)·4^k·5^(10-k) over 9^10.  Σ W_k = 9^10 and the
# MARTINGALE identity Σ W_k·25^k·16^(10-k) = 180^10 = 9^10·P_DEN
# (so E[S_T] = S0 exactly — r = 0 makes the price a martingale)
# are both re-derived and asserted in tests, never trusted.
_CRR_N = 10
_CRR_PDEN = 25 ** 5 * 16 ** 5
_CRR_DEN = 9 ** 10 * _CRR_PDEN
_CRR_GRID = [(k,
              math.comb(10, k) * 4 ** k * 5 ** (10 - k),
              25 ** k * 16 ** (10 - k)) for k in range(11)]


def crr_option_int(s0_cents: int,
                   moneyness: list = ((1, 2), (3, 4), (1, 1),
                                      (5, 4), (2, 1))) -> pd.DataFrame:
    """Cox-Ross-Rubinstein binomial option pricing (1979) —
    DERIVATIVES VALUATION, a family the surface lacked:
    loan_amortization prices credit, kelly_fraction sizes bets,
    portfolio_minvar allocates, newsvendor_stock stocks one period
    — but none values a CONTINGENT CLAIM, the right (not duty) to
    trade at a strike.  The CRR lattice with RATIONAL design
    u = 5/4, d = 4/5, r = 0 has risk-neutral q = (1−d)/(u−d) = 4/9
    exactly, so the 10-step European call/put is EXACT INTEGER
    arithmetic end to end: terminal prices S0·25^k·16^(10−k)/P and
    weights C(10,k)·4^k·5^(10−k)/9¹⁰ give call_raw(K) =
    Σ W_k·max(S0·25^k·16^(10−k) − K·P, 0), floored ONCE by
    D = 9¹⁰·P per option.  The family's defining no-arbitrage
    theorem, PUT-CALL PARITY, holds BIT-EXACT post-floor:
    call_raw − put_raw = (S0 − K)·D exactly (martingale
    Σ W_k·25^k·16^(10−k) = 180¹⁰ = 9¹⁰·P), and adding an exact
    multiple of the denominator commutes with the floor, so
    call_cents − put_cents == S0 − K on every row — carried as the
    parity_gap == 0 column (the engset make-it-VISIBLE discipline).
    Also pinned: zero-strike call == S0 exactly (the martingale
    made flesh), deep-OTM call == 0 with put == K − S0 exactly,
    monotonicity and convexity in K (in Fractions), and
    time_value = call − intrinsic ≥ 0 (C ≥ (S0−K)⁺ pre-floor
    because C − P = S0 − K with P ≥ 0).  Strikes are a MONEYNESS
    grid (num, den) → K = num·S0 // den.  Envelope: per-term
    W·payoff ≤ 8·10⁸·S0·25¹⁰ keeps S0 ≤ ~10¹⁴ cents inside
    HUGEINT — no practical cap.  Mirror: the fixed (k, weight,
    price-power) design grid as VALUES literals (the
    acceptance_sampling discipline) × the moneyness grid, HUGEINT
    throughout."""
    s0 = int(s0_cents)
    rows = []
    for num, den in moneyness:
        k_strike = int(num) * s0 // int(den)
        call_raw = sum(w * max(s0 * pw - k_strike * _CRR_PDEN, 0)
                       for _, w, pw in _CRR_GRID)
        put_raw = sum(w * max(k_strike * _CRR_PDEN - s0 * pw, 0)
                      for _, w, pw in _CRR_GRID)
        call = call_raw // _CRR_DEN
        put = put_raw // _CRR_DEN
        intrinsic = max(s0 - k_strike, 0)
        rows.append((k_strike, call, put, intrinsic,
                     call - intrinsic, call - put - (s0 - k_strike)))
    out = pd.DataFrame(rows, columns=[
        "strike_cents", "call_cents", "put_cents",
        "intrinsic_cents", "time_value_cents", "parity_gap"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _ols_centered(ys: list) -> tuple:
    """Shared exact-integer OLS core for the regression-diagnostics
    pair (durbin_watson_int / cooks_distance_int): regress y_t on
    the CENTERED DOUBLED time index x_t = 2t − (n−1) (integers,
    Σx = 0 by symmetry — the orthogonal-design trick that keeps
    every cleared quantity small enough for the HUGEINT mirror).
    With Σx = 0: slope = Sxy/Sxx, intercept = Sy/n, and the
    residual cleared by L = n·Sxx is the exact integer
    E_t = L·y_t − Sxx·Sy − n·x_t·Sxy; the leverage cleared by the
    same L is H_t = Sxx + n·x_t² (h_t = 1/n + x_t²/Sxx).  ΣH = 2L
    EXACTLY (Σh = p = 2, the hat-matrix trace law — pinned in
    tests).  Requires n ≥ 3 (n = 2 fits every point exactly and
    puts leverage at 1, so 1 − h divides by zero)."""
    n = len(ys)
    if n < 3:
        raise ValueError(f"need >= 3 points, got {n}")
    ys = [int(y) for y in ys]
    xs = [2 * t - (n - 1) for t in range(n)]
    sxx = sum(x * x for x in xs)
    sy = sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    big_l = n * sxx
    es = [big_l * y - sxx * sy - n * x * sxy
          for x, y in zip(xs, ys)]
    hs = [sxx + n * x * x for x in xs]
    return n, big_l, es, hs


def durbin_watson_int(ys: list) -> pd.DataFrame:
    """Durbin-Watson statistic (1950) — REGRESSION DIAGNOSTICS, a
    family the surface lacked: acf_lag autocorrelates a raw series
    and grouped_regression fits lines, but the founding question of
    econometric diagnostics is about the RESIDUALS of a fit — "is
    what the trend line leaves behind still serially correlated?"
    DW = Σ(e_t − e_{t−1})² / Σe_t² on the exact cleared residuals
    E_t of the centered-design OLS (``_ols_centered``); the common
    clearing factor cancels, so dw_milli = 1000·ΣΔE² // ΣE² is ONE
    non-negative floor (floor == trunc, stated).  The lag-1
    residual autocorrelation rho1_milli = 1000·ΣE_tE_{t−1} // ΣE²
    rides along as a SIGN-SPLIT truncation (the repo-wide
    discipline).  The family's defining expansion ΣΔE² = 2ΣE² −
    2ΣE_tE_{t−1} − E_0² − E_{n−1}² (which is why DW ≈ 2(1 − ρ₁))
    is pinned EXACTLY on the integers in tests, with 0 ≤ dw ≤ 4000,
    the positive-autocorrelation step series reading dw < 2000, the
    alternating series reading dw > 2000, and the PERFECT-FIT
    convention (every residual 0 → dw = 2000, rho1 = 0 — the
    no-autocorrelation null, stated)."""
    n, _, es, _ = _ols_centered(ys)
    se2 = sum(e * e for e in es)
    sd2 = sum((a - b) * (a - b) for a, b in zip(es[1:], es))
    sep = sum(a * b for a, b in zip(es[1:], es))
    if se2 == 0:
        dw, rho = 2000, 0
    else:
        dw = 1000 * sd2 // se2
        rho = ((1000 * sep // se2) if sep >= 0
               else -(1000 * (-sep) // se2))
    out = pd.DataFrame([(n, dw, rho)],
                       columns=["n_days", "dw_milli", "rho1_milli"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def cooks_distance_int(ys: list) -> pd.DataFrame:
    """Cook's distance (1977) — the INFLUENCE face of the
    regression-diagnostics pair: Durbin-Watson audits the residual
    SEQUENCE, Cook asks which single observation, if deleted, would
    move the fitted line most: D_i = e_i²·h_i / (p·s²·(1−h_i)²)
    with p = 2 and s² = Σe²/(n−2).  On the cleared integers of
    ``_ols_centered`` (E_i = L·e_i, H_i = L·h_i) every clearing
    factor cancels into the EXACT rational D_i = E_i²·H_i·(n−2)·L
    / (2·ΣE²·(L−H_i)²), floored ONCE per point at per-MILLE —
    per-mille (not ppm) is the documented contract because the
    numerator already carries E²·H·n·L and the extra 10³ headroom
    is what keeps daily counts up to ~3·10⁶ inside HUGEINT (the
    acceptance_sampling envelope discipline).  All terms
    non-negative (H_i < L whenever n ≥ 3 — proved in the kernel:
    n·x² < (n−1)·Sxx since Sxx = n(n²−1)/3), so floor == trunc.
    leverage_ppm = 10⁶·H_i // L rides along with the hat-trace law
    ΣH = 2L exact, end-point maximality, and symmetry pinned;
    influential = n·cook_milli > 4000 (the classical D > 4/n
    screen, made integer).  Perfect fit → every D = 0 (stated)."""
    n, big_l, es, hs = _ols_centered(ys)
    se2 = sum(e * e for e in es)
    rows = []
    for t, (y, e, h) in enumerate(zip(ys, es, hs)):
        lev = 1_000_000 * h // big_l
        if se2 == 0:
            cook = 0
        else:
            cook = (1000 * e * e * h * (n - 2) * big_l
                    // (2 * se2 * (big_l - h) * (big_l - h)))
        rows.append((t, int(y), lev, cook,
                     1 if n * cook > 4000 else 0))
    out = pd.DataFrame(rows, columns=[
        "day_idx", "n_count", "leverage_ppm", "cook_milli",
        "influential"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def buhlmann_int(groups: list) -> pd.DataFrame:
    """Bühlmann credibility (1967) — ACTUARIAL EXPERIENCE RATING, a
    family the surface lacked: chain_ladder RESERVES claims,
    stoploss_layers PRICES layers, eb_shrink shrinks rates toward a
    Beta prior — but ratemaking's founding question is the BLEND,
    "how much should this risk class's own experience count against
    the collective book?", and Bühlmann's answer Z = n/(n + k) with
    k = (within variance)/(variance of hypothetical means) is the
    linear-Bayes cornerstone the whole credibility literature
    builds on.  ``groups`` is [(name, n, Σcents, Σcents²)].  Exact
    integer contract built on the ANOVA floor discipline (one floor
    per group for SSW, one grand floor for SST, SSB clamped ≥ 0 —
    the anova_oneway conventions verbatim): v̂_milli =
    1000·SSW // (N−K); the between-means estimator clears to
    â = N·(SSB(N−K) − SSW(K−1)) / ((N−K)(N² − Σnᵢ²)) — the
    unbiased Bühlmann-Straub â with n₀ = (N² − Σnᵢ²)/(N(K−1)), the
    (K−1)'s cancelling — floored at milli and CLAMPED at zero
    (zero_cred = 1 flags the clamp; clamping makes the floor/trunc
    divergence on negatives immaterial — both land ≤ 0 and the
    clamp takes them to 0, stated).  Then per class
    z_ppm = 10⁶·nᵢ·â // (nᵢ·â + v̂) — one floor on the FLOORED
    estimators (the declared chain; a Fraction replay of the exact
    chain pins the implementation) — and the credibility premium
    premium_milli = (z·1000·Sᵢ·N + (10⁶−z)·1000·S·nᵢ) //
    (10⁶·nᵢ·N), one floor, provably between the individual and
    collective means (pre-floor; within 1 post-floor, pinned).
    Laws pinned: Z ∈ [0, 10⁶], Z monotone in nᵢ at shared
    estimators, â = 0 → every Z = 0 and premium == collective
    mean, zero WITHIN variance → Z = 10⁶ exactly and premium ==
    individual mean.  Degenerate all-constant corpus: Z = 0
    (stated).  Envelope: z·10³·Sᵢ·N ≤ 6·10³⁷ caps the book at
    ~10¹² rows inside HUGEINT — documented.  Requires N > K ≥ 2
    and at least two nonempty classes."""
    ks = sorted((str(nm), int(n), int(s), int(q))
                for nm, n, s, q in groups)
    kk = len(ks)
    nn = sum(n for _, n, _, _ in ks)
    ss = sum(s for _, _, s, _ in ks)
    qq = sum(q for _, _, _, q in ks)
    sn2 = sum(n * n for _, n, _, _ in ks)
    if kk < 2 or nn <= kk or nn * nn == sn2:
        raise ValueError("need >= 2 nonempty classes and N > K")
    ssw = qq - sum(s * s // n for _, n, s, _ in ks)
    sst = qq - ss * ss // nn
    ssb = max(0, sst - ssw)
    v_milli = 1000 * ssw // (nn - kk)
    a_num = nn * (ssb * (nn - kk) - ssw * (kk - 1))
    a_den = (nn - kk) * (nn * nn - sn2)
    a_milli = max(0, (1000 * a_num // a_den) if a_num >= 0
                  else -(1000 * (-a_num) // a_den))
    zero_cred = 1 if a_num <= 0 else 0
    rows = []
    for nm, n, s, _ in ks:
        den = n * a_milli + v_milli
        z = 1_000_000 * n * a_milli // den if den > 0 else 0
        prem = ((z * 1000 * s * nn + (1_000_000 - z) * 1000
                 * ss * n) // (1_000_000 * n * nn))
        rows.append((nm, n, 1000 * s // n, z, prem,
                     v_milli, a_milli, zero_cred))
    out = pd.DataFrame(rows, columns=[
        "event_type", "n_grp", "mean_milli", "z_ppm",
        "premium_milli", "v_milli", "a_milli", "zero_cred"])
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    return out


def littlewood_int(counts: list, fares: list) -> pd.DataFrame:
    """Littlewood's rule (1972) — REVENUE MANAGEMENT, a family the
    surface lacked: newsvendor_stock stocks ONE product against
    demand, but yield management's founding result allocates ONE
    capacity between TWO fare classes — protect y seats for the
    late-booking high fare f1 and sell the rest low at f2, where
    y* = max{y : f1·P(D ≥ y) > f2} on the EMPIRICAL high-fare
    demand distribution.  ZERO floors: the whole statistic is
    integer comparisons — f1·#{days with demand ≥ y} > n·f2 — and
    the kernel takes the ORDER-STATISTIC closed form
    y* = d₍ᵢ₎ with i = n·f2 // f1 + 1 (the i-th LARGEST daily
    count; i > n → protect 0), PROVEN equal to the grid definition
    in tests by brute force — while the SQL mirror deliberately
    walks the first-principles grid (max qualifying y over
    0..max(d)), so the query is a genuine two-algorithm
    cross-check (the h_index discipline).  tail_days = #{d ≥ y*}
    and margin = f1·tail_days − n·f2 ride along as the visible
    certificate (margin > 0 whenever y* > 0).  Laws pinned:
    f2 → 0 protects the maximum observed demand, f2 ≥ f1 protects
    nothing, monotone non-increasing in f2, and the tie case."""
    ds = sorted((int(c) for c in counts), reverse=True)
    n = len(ds)
    rows = []
    for f1, f2 in fares:
        f1, f2 = int(f1), int(f2)
        i = n * f2 // f1 + 1
        y = ds[i - 1] if i <= n else 0
        tail = sum(1 for d in ds if d >= y)
        rows.append((f1, f2, y, tail, f1 * tail - n * f2))
    out = pd.DataFrame(rows, columns=[
        "f1_cents", "f2_cents", "protect_level", "tail_days",
        "margin"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def double_auction_int(bid_hist: list, ask_hist: list) -> pd.DataFrame:
    """Walrasian k-double-auction clearing — TWO-SIDED MARKET
    MICROSTRUCTURE, a family the surface lacked: gsp_auction and
    vcg_payments price ONE seller's slots, nw_transport moves flow
    over a fixed tableau, but "n buyers meet m sellers, who trades
    and at what price" is the market-clearing question, and the
    k-double auction's answer is the Walrasian crossing.  Inputs
    are BOUNDED-DOMAIN price histograms [(cents, n)] — bids (AM
    event values) and asks (PM event values) — so the whole clear
    is cumsum algebra over the value domain, never a row sort.
    The engine computes k* = max_p min(D(p), S(p)) over the ask-
    value candidate grid (D = #bids ≥ p step-falls at bids, S =
    #asks ≤ p step-rises at asks, so the first price attaining the
    max-min is an ask value — stated), while the SQL mirror uses
    the PREFIX definition k* = max{k : b₍ₖ₎ ≥ s₍ₖ₎} on rank-joined
    sorted books — the two are EQUAL (b₍ₖ₎ ≥ p ≥ s₍ₖ₎ for any p in
    the crossing interval gives min(D,S) ≥ k, and conversely
    min(D(p),S(p)) ≥ m exhibits m crossing pairs), a theorem pinned
    by brute force in tests, making the query a genuine
    two-algorithm cross-check (the h_index discipline).  Marginal
    prices b₍ₖ₎/s₍ₖ₎ are order statistics off the histogram
    cumsums (the brown_forsythe discipline), the midpoint floors
    once, and gains = Σ top-k bids − Σ bottom-k asks is exact
    integer partial sums with the boundary-cell correction.
    Pinned: individual rationality s₍ₖ₎ ≤ mid ≤ b₍ₖ₎, prefix-
    surplus maximality (gains are the max over all prefix sizes,
    and every traded pair has b ≥ s), the no-trade market (all
    bids below all asks → all-zero row, stated convention), and
    the tie-heavy book.  ZERO floors except the midpoint."""
    import numpy as np

    bh = sorted((int(c), int(n)) for c, n in bid_hist)
    ah = sorted((int(c), int(n)) for c, n in ask_hist)
    if not bh or not ah:
        return _da_row(0, 0, 0, 0, 0)
    bc = np.array([c for c, _ in bh], dtype=object)
    bn = np.array([n for _, n in bh], dtype=object)
    ac = np.array([c for c, _ in ah], dtype=object)
    an = np.array([n for _, n in ah], dtype=object)
    b_tail = np.cumsum(bn[::-1])[::-1]       # #bids >= bc[i]
    a_head = np.cumsum(an)                   # #asks <= ac[i]
    # D(p) at each ask candidate p = ac[j]: #bids >= p
    idx = np.searchsorted(bc, ac, side="left")
    d_at = np.where(idx < len(bc), b_tail[np.minimum(idx, len(bc) - 1)], 0)
    kk = 0
    for j in range(len(ac)):
        kk = max(kk, min(int(d_at[j]), int(a_head[j])))
    if kk == 0:
        return _da_row(0, 0, 0, 0, 0)
    # k-th largest bid / k-th smallest ask via cumsum crossings
    cs_b = np.cumsum(bn[::-1])               # from top of book
    ib = int(np.searchsorted(cs_b, kk, side="left"))
    b_k = int(bc[::-1][ib])
    top_sum = (sum(int(c) * int(n) for c, n in
                   zip(bc[::-1][:ib + 1], bn[::-1][:ib + 1]))
               - (int(cs_b[ib]) - kk) * b_k)
    ia = int(np.searchsorted(a_head, kk, side="left"))
    s_k = int(ac[ia])
    bot_sum = (sum(int(c) * int(n) for c, n in
                   zip(ac[:ia + 1], an[:ia + 1]))
               - (int(a_head[ia]) - kk) * s_k)
    return _da_row(kk, b_k, s_k, (b_k + s_k) // 2,
                   top_sum - bot_sum)


def _da_row(k, b, s, m, g) -> pd.DataFrame:
    out = pd.DataFrame([(k, b, s, m, g)], columns=[
        "n_trades", "buyer_marginal_cents", "seller_marginal_cents",
        "mid_price_cents", "gains_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def secretary_int(counts: list) -> pd.DataFrame:
    """Secretary-problem optimal stopping (the 1/e rule, exact) —
    OPTIMAL STOPPING, a family the surface lacked: every scheduler
    on the surface (wspt, johnson, critical_path) sees all its jobs
    up front, but the secretary problem decides IRREVOCABLY online:
    observe the first r−1 of n values, then take the first one
    that beats everything seen.  The optimal cutoff maximizes
    φ(r) = ((r−1)/n)·Σ_{j=r}^n 1/(j−1)  (φ(1) = 1/n), and clearing
    the harmonic tail by L = lcm(1..n−1) makes the argmax EXACT
    integer comparison: K(r) = (r−1)·Σ_{j=r}^n L//(j−1) for r ≥ 2,
    K(1) = L (each L//(j−1) is exact by construction of L); ties
    break to the smallest r (stated).  phi_ppm = 10⁶·K(r*) //
    (n·L), one floor.  lcm (not factorial) is what keeps the
    mirror inside HUGEINT to n ≈ 85 observations (lcm(1..n) ~ eⁿ
    vs n! — the envelope, documented); the corpus has 30 days.
    The rule then RUNS on the actual day-ordered sequence: pick
    the first day t ≥ r* whose count STRICTLY beats the running
    prefix max (strictness stated — ties are not 'relatively
    best'), else the forced last day; is_max reports whether the
    picked VALUE equals the global max.  Pinned: the classical
    n = 30 cutoff r* = 12 with φ ≈ 0.3787 (Fraction-checked), the
    n → e asymptotics bracket (φ(r*) ≥ 1/e − 1/n), brute-force
    Fraction argmax equality on every n ≤ 40, policy hand cases
    including the forced-last-day and all-descending sequences,
    and the n = 2 edge (φ = 1/2 at both cutoffs, tie to r = 1)."""
    ds = [int(c) for c in counts]
    n = len(ds)
    if n < 2:
        raise ValueError("need >= 2 observations")
    big_l = math.lcm(*range(1, n))
    tails = [0] * (n + 2)
    for j in range(n, 1, -1):                # suffix sums of L//(j-1)
        tails[j] = tails[j + 1] + big_l // (j - 1)
    keys = {1: big_l}
    for r in range(2, n + 1):
        keys[r] = (r - 1) * tails[r]
    r_star = max(range(1, n + 1), key=lambda r: (keys[r], -r))
    phi_ppm = 1_000_000 * keys[r_star] // (n * big_l)
    picked = n - 1                            # forced last day
    run_max = None
    for t in range(n):
        if t >= r_star - 1 and run_max is not None and ds[t] > run_max:
            picked = t
            break
        if r_star == 1 and t == 0:
            picked = 0
            break
        run_max = ds[t] if run_max is None else max(run_max, ds[t])
    out = pd.DataFrame([(n, r_star, phi_ppm, picked, ds[picked],
                         1 if ds[picked] == max(ds) else 0)],
                       columns=["n_days", "r_star", "phi_ppm",
                                "picked_day", "picked_value",
                                "is_max"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def erdos_gallai_int(degree_hist: list, kmax: int) -> pd.DataFrame:
    """Erdős-Gallai graphicality test (1960) — DEGREE-SEQUENCE
    REALIZABILITY, a family the surface lacked: clustering_coeff,
    degree_assortativity and kcore_nodes MEASURE a graph that
    exists, but "could these degrees be a simple graph at all" is
    the inverse question, and Erdős-Gallai answers it with n
    inequalities: Σ_{i≤k} d₍ᵢ₎ ≤ k(k−1) + Σ_{i>k} min(d᎐ᵢ, k) for
    every k (degrees sorted desc) plus even total.  ``degree_hist``
    is the BOUNDED histogram [(degree, count)] (the corpus instance
    is per-user distinct-type degrees ≤ 5, so the whole test is
    six-cell cumsum algebra); only k ≤ s = max{i : d₍ᵢ₎ ≥ i} can
    fail (for k > s the LHS ≤ k·d₍ₖ₎ < k·k ≤ RHS — the classical
    reduction, which is why the fixed k ≤ kmax grid with
    kmax ≥ max degree is COMPLETE for bounded-degree instances,
    stated), so the output is one row per k in 1..kmax with exact
    lhs / rhs / slack, beside the parity check and the overall
    verdict.  Top-k sums and the tail Σ min(d, k) use the
    double_auction boundary-cell split — take whole cells from the
    top, split the crossing cell, then tail-min = Σ_{d≤k} d·m′ +
    k·Σ_{d>k} m′ on the remainder.  The THEOREM itself (EG ⟺
    Havel-Hakimi realizability) is pinned in tests by brute force
    over hundreds of random sequences — the check is not assumed,
    it is exercised against an actual realizer.  ZERO floors."""
    cells = sorted(((int(d), int(m)) for d, m in degree_hist),
                   reverse=True)
    n = sum(m for _, m in cells)
    total = sum(d * m for d, m in cells)
    parity_ok = 1 if total % 2 == 0 else 0
    rows = []
    all_ok = parity_ok
    for k in range(1, int(kmax) + 1):
        # top-k sum with boundary split
        taken, lhs = 0, 0
        tail = []                      # (d, m) left after the top-k
        for d, m in cells:
            if taken >= k:
                tail.append((d, m))
                continue
            use = min(m, k - taken)
            lhs += d * use
            taken += use
            if use < m:
                tail.append((d, m - use))
        tailmin = sum(min(d, k) * m for d, m in tail)
        rhs = k * (k - 1) + tailmin
        slack = rhs - lhs
        if slack < 0:
            all_ok = 0
        rows.append((k, lhs, rhs, slack))
    out = pd.DataFrame(rows, columns=["k", "lhs", "rhs", "slack"])
    out["n_nodes"] = n
    out["sum_degrees"] = total
    out["parity_ok"] = parity_ok
    out["graphical"] = all_ok
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def record_values_int(ys: list) -> pd.DataFrame:
    """Record-value statistics (Rényi 1962) — RECORDS THEORY, the
    extreme-value family's discrete heart, which the surface
    lacked: trend_flips counts direction changes and mann_kendall
    scores monotonicity, but "how many times did the running
    maximum get beaten" is the records question, with the founding
    exchangeability theorem E[#records] = H_n = Σ 1/j for
    continuous iid — verified in tests by EXHAUSTIVE ENUMERATION
    over all 120 permutations of 5 distinct values (mean record
    count == H₅ in Fractions), not just cited.  Upper records
    strictly beat the prefix max (day 1 is a record; ties are NOT
    records — stated, and why the integer-count corpus sits below
    the continuous H_n benchmark), lower records mirror it, and
    the up(y) == down(−y) symmetry is pinned.  The benchmark and
    its variance clear by L = lcm(1..n) (the secretary_stop
    discipline): H_n = A/L with A = Σ L//j exact,
    expected_milli = 1000·A // L one floor, and
    Var = H_n − H_n⁽²⁾ = (A·L − B)/L² with B = Σ (L//j)² —
    var_milli = 1000·(A·L − B) // L², one floor, non-negative
    (1/j ≥ 1/j²).  first_max_day = first day attaining the global
    max (0-based).  Pinned: monotone sequences read n and 1,
    constants read 1 and 1, and both floors replay in Fractions."""
    ds = [int(y) for y in ys]
    n = len(ds)
    if n < 1:
        raise ValueError("need >= 1 observation")
    up, dn = 1, 1
    mx, mn = ds[0], ds[0]
    first_max = 0
    for t in range(1, n):
        if ds[t] > mx:
            up += 1
            mx = ds[t]
            first_max = t
        if ds[t] < mn:
            dn += 1
            mn = ds[t]
    if ds[first_max] != max(ds):           # never beaten day 0
        first_max = 0
    big_l = math.lcm(*range(1, n + 1))
    a = sum(big_l // j for j in range(1, n + 1))
    b = sum((big_l // j) ** 2 for j in range(1, n + 1))
    out = pd.DataFrame([(n, up, dn, first_max,
                         1000 * a // big_l,
                         1000 * (a * big_l - b) // (big_l * big_l))],
                       columns=["n_days", "records_up",
                                "records_down", "first_max_day",
                                "expected_milli", "var_milli"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def ballot_walk_int(a_counts: list, b_counts: list) -> pd.DataFrame:
    """Bertrand ballot probability + lead-time statistics of the
    two-type daily race — FLUCTUATION THEORY, a family the surface
    lacked: mann_kendall and page_trend score MONOTONE drift, but
    fluctuation theory asks about the WALK — who led, for how
    long, when was the last tie — the questions Feller's ballot/
    arcsine chapter owns.  S_t = Σ_{d≤t}(a_d − b_d) over the day
    grid (1-based; the notional S_0 = 0 start means last_tie_day
    = 0 when the walk never re-ties — stated); lead/tie day counts
    partition n exactly (pinned), extremes and the final lead ride
    along, and the famous closed form — Bertrand 1887: in a random
    ordering of A votes against B (A > B), P(winner leads
    THROUGHOUT) = (A − B)/(A + B) — is evaluated on the corpus
    totals as one ppm floor, and the theorem itself is pinned by
    EXHAUSTIVE ENUMERATION over small ballots (every interleaving
    counted, fraction == the closed form in Fractions), never
    cited on faith.  ZERO floors except the ballot ppm."""
    a = [int(v) for v in a_counts]
    b = [int(v) for v in b_counts]
    if len(a) != len(b):
        raise ValueError("day grids must align")
    n = len(a)
    s = 0
    lead_a = lead_b = ties = last_tie = 0
    mx = mn = 0
    for t in range(1, n + 1):
        s += a[t - 1] - b[t - 1]
        if s > 0:
            lead_a += 1
        elif s < 0:
            lead_b += 1
        else:
            ties += 1
            last_tie = t
        mx = max(mx, s)
        mn = min(mn, s)
    ta, tb = sum(a), sum(b)
    ballot = (1_000_000 * abs(ta - tb) // (ta + tb)
              if ta + tb > 0 else 0)
    out = pd.DataFrame([(n, lead_a, lead_b, ties, last_tie,
                         mx, mn, s, ballot)],
                       columns=["n_days", "lead_a_days",
                                "lead_b_days", "tie_days",
                                "last_tie_day", "max_lead",
                                "min_lead", "final_lead",
                                "ballot_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def backlog_dam_int(ys: list, ratios: list) -> pd.DataFrame:
    """Lindley backlog / Moran dam recursion (1952/1954) — STORAGE
    THEORY, a family the surface lacked: mm1 and mg1_queue price
    STATIONARY waits under stochastic assumptions, but the dam
    model asks what THIS sequence of daily inflows does to a
    finite-rate server: B_d = max(0, B_{d−1} + y_d − c), the
    founding recursion of queueing's sample-path half.  Capacity
    grid c = r%·(mean daily volume) (mean floored once, each c
    floored once).  The engine does NOT walk the recursion: it
    uses the REFLECTION DUALITY B_t = W_t − min(0, min_{j≤t} W_j)
    on the cumulative net-input walk W (Lindley's identity, the
    fluctuation theorem of queueing), fully vectorized — while the
    SQL mirror walks the raw recursion as a recursive CTE, so the
    query is a genuine two-algorithm cross-check AND a proof of
    the identity on real data; the equivalence is additionally
    pinned on seeded draws against a step-by-step Python replay.
    Pinned laws: c ≥ max inflow → identically zero backlog,
    c = 0 → B_n = total inflow, backlog pointwise non-increasing
    in capacity, and congested-day accounting.  ZERO floors beyond
    the two capacity floors."""
    import numpy as np

    y = [int(v) for v in ys]
    n = len(y)
    if n == 0:
        raise ValueError("need >= 1 day")
    mean = sum(y) // n
    rows = []
    for r in ratios:
        c = int(r) * mean // 100
        w = np.cumsum(np.array(y, dtype=object) - c)
        runmin = np.minimum.accumulate(np.minimum(w, 0))
        bt = w - runmin
        rows.append((int(r), c, int(bt[-1]),
                     int(max(bt.max(), 0)),
                     int((bt > 0).sum())))
    out = pd.DataFrame(rows, columns=[
        "ratio_pct", "capacity", "final_backlog", "max_backlog",
        "congested_days"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def stochastic_dominance_int(a_hist: list, b_hist: list) -> pd.DataFrame:
    """First- and second-order stochastic dominance verdicts —
    DECISION THEORY UNDER RISK, a family the surface lacked:
    ks_drift measures the DISTANCE between two empirical
    distributions, but dominance is an ORDERING — "would every
    expected-utility maximizer (FSD: any increasing u; SSD: any
    increasing concave u) prefer A?" — the Rothschild-Stiglitz
    question distance can't answer.  Pure cumsum algebra over the
    merged bounded value domain, cross-multiplied by the sample
    sizes so every comparison is exact integers, ZERO floors:
    FSD(A ≥ B) ⟺ n_B·cumA(x) ≤ n_A·cumB(x) at every merged grid
    point, and SSD integrates the CDFs stepwise (I_i = Σ cum_j ·
    gap_j; between grid points the CDF gap is constant so the
    integral is linear and extremes sit AT grid points — why the
    grid check is complete, stated; the x→∞ tail adds zero because
    both CDFs are 1 beyond the merged max, which is also why the
    mean ordering μ_A ≥ μ_B is implied rather than separately
    required).  Margins are SIGNED maxima of the cross-multiplied
    gaps (≤ 0 ⟺ weak dominance holds; identical distributions
    dominate each other weakly with margin 0 — stated).  Pinned:
    FSD ⟹ SSD on every seeded draw, FSD ⟹ cross-multiplied mean
    ordering, a downward shift is FSD-dominated, and the classic
    mean-preserving spread ({5,5} vs {4,6}: SSD holds, FSD fails)
    — Rothschild-Stiglitz made a hand case."""
    am = {int(c): int(n) for c, n in a_hist}
    bm = {int(c): int(n) for c, n in b_hist}
    na, nb = sum(am.values()), sum(bm.values())
    if na == 0 or nb == 0:
        raise ValueError("both samples must be nonempty")
    xs = sorted(set(am) | set(bm))
    ca = cb = 0
    ia = ib = 0                 # integrated CDFs up to current x
    fsd_ab = fsd_ba = ssd_ab = ssd_ba = None
    prev = None
    for x in xs:
        if prev is not None:
            gap = x - prev
            ia += ca * gap
            ib += cb * gap
        s_ab = nb * ia - na * ib          # <= 0 iff SSD(A>=B) so far
        ssd_ab = s_ab if ssd_ab is None else max(ssd_ab, s_ab)
        ssd_ba = -s_ab if ssd_ba is None else max(ssd_ba, -s_ab)
        ca += am.get(x, 0)
        cb += bm.get(x, 0)
        f_ab = nb * ca - na * cb          # <= 0 iff FSD(A>=B) so far
        fsd_ab = f_ab if fsd_ab is None else max(fsd_ab, f_ab)
        fsd_ba = -f_ab if fsd_ba is None else max(fsd_ba, -f_ab)
        prev = x
    # final integral point (x = merged max) for SSD
    s_ab = nb * ia - na * ib
    ssd_ab = max(ssd_ab, s_ab)
    ssd_ba = max(ssd_ba, -s_ab)
    # ... plus the full-line value, which equals the mean gap and
    # is reached AT the max grid point after the last cum update:
    # integrate one more virtual step of width 0 — already covered.
    out = pd.DataFrame([(na, nb,
                         1 if fsd_ab <= 0 else 0,
                         1 if fsd_ba <= 0 else 0,
                         1 if ssd_ab <= 0 else 0,
                         1 if ssd_ba <= 0 else 0,
                         fsd_ab, fsd_ba, ssd_ab, ssd_ba)],
                       columns=["n_a", "n_b", "fsd_ab", "fsd_ba",
                                "ssd_ab", "ssd_ba",
                                "fsd_margin_ab", "fsd_margin_ba",
                                "ssd_margin_ab", "ssd_margin_ba"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def myerson_reserve_int(hist: list) -> pd.DataFrame:
    """Empirical revenue-maximizing posted price — MONOPOLY PRICING
    a family the surface lacked: price_elasticity REGRESSES demand
    on price, gsp/vcg price slots given bids, but "what single
    posted price maximizes revenue against this empirical demand
    curve" is Myerson's monopoly problem with the data as the
    distribution: r* = argmax r·#{v ≥ r}.  On a step demand curve
    the revenue r·tail(r) is linear-increasing in r between
    observed values, so the argmax sits AT an observed value (the
    candidate restriction, stated and pinned by brute force over
    EVERY integer price); ties break to the smallest price
    (stated).  Output carries three POLICY rows — optimal, mean
    (one floor), lower-median (order statistic off the cumsums) —
    so the optimality gap is VISIBLE (the engset discipline):
    revenue_optimal ≥ both, pinned.  share_served_ppm is the one
    other floor.  Pinned: the uniform 1..10 hand case (revenue 30
    tie at r ∈ {5,6} → 5), brute-force argmax equality on 30
    seeded draws, and optimal-beats-benchmarks on every draw."""
    cells = sorted((int(c), int(n)) for c, n in hist)
    ntot = sum(n for _, n in cells)
    if ntot == 0:
        raise ValueError("empty histogram")
    total = sum(c * n for c, n in cells)
    # tails via desc cumsum; candidates are the observed values
    best_r, best_rev, best_tail = 0, -1, 0
    tail = ntot
    for c, n in cells:
        rev = c * tail
        if rev > best_rev or (rev == best_rev and c < best_r):
            best_r, best_rev, best_tail = c, rev, tail
        tail -= n
    mean_p = total // ntot
    half = (ntot + 1) // 2
    cum = 0
    med_p = cells[-1][0]
    for c, n in cells:
        cum += n
        if cum >= half:
            med_p = c
            break
    rows = []
    for name, p in (("optimal", best_r), ("mean", mean_p),
                    ("median", med_p)):
        t = sum(n for c, n in cells if c >= p)
        rows.append((name, p, t, p * t,
                     1_000_000 * t // ntot))
    out = pd.DataFrame(rows, columns=[
        "policy", "price_cents", "buyers_served", "revenue_cents",
        "share_served_ppm"])
    for c in out.columns:
        if c != "policy":
            out[c] = out[c].astype("int64")
    return out


def _cea_int(caps: list, budget: int) -> dict:
    """Constrained-equal-awards integer waterfill: min(cap, level)
    with the waterfill_allocate base//m + first-(rem%m)-get-+1
    remainder discipline in (cap, name) order — total, deterministic,
    and Σ awards == budget EXACTLY (budget ≤ Σ caps required)."""
    rows = sorted((int(c), str(nm)) for nm, c in caps)
    out = {}
    rem, m = int(budget), len(rows)
    for i, (c, nm) in enumerate(rows):
        if c * m <= rem:
            out[nm] = c
            rem -= c
            m -= 1
        else:
            base, extra = rem // m, rem % m
            for j, (c2, nm2) in enumerate(rows[i:]):
                out[nm2] = base + (1 if j < extra else 0)
            return out
    return out


def talmud_split_int(claims: list, pcts: list) -> pd.DataFrame:
    """The Talmud bankruptcy rule (Aumann-Maschler 1985) — CLAIMS
    PROBLEMS, a family the surface lacked: airport_game shares a
    COST by the Shapley closed form, waterfill_budget splits a
    budget max-min fair, but "an estate smaller than the claims
    against it" is the 2000-year-old division puzzle whose Mishnah
    table (claims 100/200/300 vs estates 100/200/300) stumped
    commentators until Aumann-Maschler showed every row is the
    nucleolus of the induced game, computable as CONTESTED GARMENT
    consistency: for E ≤ C/2, constrained equal awards on the
    HALF-claims; for E > C/2, the self-dual image award = c −
    T(C−E) (so self-duality holds BY CONSTRUCTION on that branch,
    and both branches agree at E = C/2 — pinned).  Exact integer
    contract: everything runs in DOUBLED units (the brown_forsythe
    doubling discipline) so half-claims are the integer c_i and the
    doubled estate is 2E; the CEA waterfill reuses the
    waterfill_allocate remainder discipline, making Σ awards ==
    2E EXACT with no floor anywhere except E = pct·C // 100 and
    the reporting column award_cents = award_x2 // 2.  Pinned: the
    FULL Mishnah table in doubled units ((67,67,66) / (100,150,
    150) / (100,200,300) — the small-estate equal-division law
    reads max−min ≤ 1, the middle row is the famous (50,75,75),
    E = C/2 reads exactly the half-claims), the contested-garment
    ¼–¾ split on claims (100,50) with E = 100, self-duality
    T(E) + T(C−E) == c exact on seeded draws, order preservation
    UP TO the one-unit remainder rule (the first rem%m creditors
    in ascending-claim order take the +1, so a smaller claim can
    exceed a larger by exactly 1 doubled unit — stated, pinned),
    and 0 ≤ award_x2 ≤ 2·claim."""
    cs = sorted((str(nm), int(c)) for nm, c in claims)
    big_c = sum(c for _, c in cs)
    rows = []
    for pct in pcts:
        estate = int(pct) * big_c // 100
        if 2 * estate <= big_c:
            aw = _cea_int([(nm, c) for nm, c in cs], 2 * estate)
        else:
            dual = _cea_int([(nm, c) for nm, c in cs],
                            2 * (big_c - estate))
            aw = {nm: 2 * c - dual[nm] for nm, c in cs}
        for nm, c in cs:
            rows.append((int(pct), estate, nm, c, aw[nm],
                         aw[nm] // 2))
    out = pd.DataFrame(rows, columns=[
        "estate_pct", "estate_cents", "event_type", "claim_cents",
        "award_x2", "award_cents"])
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    return out


def adjusted_winner_int(items: list) -> pd.DataFrame:
    """Adjusted Winner (Brams-Taylor 1996) — EQUITABLE ALLOCATION,
    the goods-division face of fair division (talmud_split divides
    a deficit; AW divides GOODS between two players so that both
    end with the SAME share of their own valuations): assign each
    item to its higher (cross-multiplied normalized) valuer, then
    transfer items from the richer side in increasing efficiency-
    ratio order, splitting exactly one pivot item.  Integer
    contract: values a_i (player A) and b_i (player B) with totals
    TA, TB; normalized comparisons cross-multiply (a_i·TB vs
    b_i·TA — ties to A, stated), the equity gap is the exact
    integer U = SA·TB − SB·TA, a full transfer of item i moves U
    by exactly −(a_i·TB + b_i·TA), and the pivot fraction
    x = U_left/(a_i·TB + b_i·TA) ∈ (0,1) is the ONE ppm floor in
    the whole op.  Items worth zero to both players carry no
    weight and stay put (stated).  The THEOREMS are pinned in
    Fractions: post-transfer equitability is EXACT pre-floor,
    envy-freeness (each player ends ≥ 1/2 of own total — Brams-
    Taylor's guarantee for 2 players), transfers happen in ratio
    order (efficiency/Pareto), the floored fraction replays, and
    the symmetric-swap law AW(a,b) mirrors AW(b,a)."""
    its = [(str(nm), int(a), int(b)) for nm, a, b in items]
    ta = sum(a for _, a, _ in its)
    tb = sum(b for _, _, b in its)
    if ta == 0 or tb == 0:
        raise ValueError("both players need positive total value")
    holder = {nm: ("A" if a * tb >= b * ta else "B")
              for nm, a, b in its}
    sa = sum(a for nm, a, _ in its if holder[nm] == "A")
    sb = sum(b for nm, _, b in its if holder[nm] == "B")
    u = sa * tb - sb * ta
    frac = {nm: (0 if holder[nm] == "A" else 1_000_000)
            for nm, _, _ in its}
    if u != 0:
        rich = "A" if u > 0 else "B"
        gap = abs(u)
        # rich side's items, increasing own-advantage ratio; items
        # worthless to both move nothing and stay put
        cand = [(nm, a, b) for nm, a, b in its
                if holder[nm] == rich and a * tb + b * ta > 0]
        # ratio order a_i/b_i (rich = A) — the tb/ta factors cancel
        # in the ORDERING, so the comparator is the pure integer
        # cross-multiplication a_j·b_i < a_i·b_j (which also sorts
        # b = 0 "infinite" ratios last with no sentinel); ties by
        # name.  The SQL mirror ranks by the identical comparator.
        if rich == "A":
            cand.sort(key=lambda t: ((0, Fraction(t[1], t[2]))
                                     if t[2] else (1, 0), t[0]))
        else:
            cand.sort(key=lambda t: ((0, Fraction(t[2], t[1]))
                                     if t[1] else (1, 0), t[0]))
        for nm, a, b in cand:
            w = a * tb + b * ta
            if gap >= w:               # full transfer
                gap -= w
                frac[nm] = 1_000_000 if rich == "A" else 0
                if gap == 0:
                    break
            else:                      # pivot: the ONE ppm floor
                x = 1_000_000 * gap // w
                frac[nm] = x if rich == "A" else 1_000_000 - x
                break
    rows = [(nm, a, b, holder[nm], frac[nm]) for nm, a, b in its]
    out = pd.DataFrame(rows, columns=[
        "event_type", "a_value", "b_value", "init_holder",
        "frac_to_b_ppm"])
    out["total_a"] = ta
    out["total_b"] = tb
    for c in ("a_value", "b_value", "frac_to_b_ppm", "total_a",
              "total_b"):
        out[c] = out[c].astype("int64")
    return out


def kalman_level_int(ys: list, q_ppm: int, r_ppm: int) -> pd.DataFrame:
    """1-D Kalman filter, local-level model (Kalman 1960) — STATE
    ESTIMATION, a family the surface lacked: ewma_backtest smooths
    with a FIXED gain, but the Kalman filter derives its gain from
    the variance bookkeeping P, and the gain ADAPTS — large while
    uncertain, settling toward the Riccati fixed point.  Exact
    floored-chain contract (the mm1/erlang/loan chain discipline,
    one documented floor per quantity per step, replayed
    identically by the recursive-CTE mirror): with variances in
    ppm units and state in milli-counts, from x₁ = 1000·y₁,
    P₁ = 10⁶ (stated inits):  P⁻ = P + Q;
    K = 10⁶·P⁻ // (P⁻ + R);  x ← x + K·(1000·y − x) trunc'd
    toward zero (SIGN-SPLIT — the innovation is signed, the
    repo-wide discipline);  P ← (10⁶ − K)·P⁻ // 10⁶.  Pinned:
    R = 0 reads K = 10⁶ exactly and the filter tracks the
    observation bit-exactly; Q = 0 with P₁ = 0 reads K = 0 and the
    estimate never moves; the gain STABILIZES (floored Riccati
    reaches a fixed point: |K_t − K_{t−1}| ≤ 1 after burn-in; the
    exact continuous fixed point solves P² + PQ − RQ = 0, and with
    R = 1e6 the steady gain EQUALS the steady filtered variance,
    K* = P* = (−Q + √(Q² + 4RQ))/2R — for Q = ¼R that is
    (−1+√17)/8 = 0.3903882…, and the floored chain lands within
    one ppm of ⌊10⁶K*⌋ = 390388 — the chain pins that bracket,
    never the irrational); P is non-increasing from the high start
    (within
    the one-ppm floor jitter); the estimate stays a convex
    combination of past data (within 1 milli of the observed
    range); and a three-step hand replay is checked digit for
    digit."""
    y = [int(v) for v in ys]
    n = len(y)
    if n == 0:
        raise ValueError("need >= 1 observation")
    q, r = int(q_ppm), int(r_ppm)
    x, p = 1000 * y[0], 1_000_000
    rows = [(0, y[0], x, 0, p)]
    for t in range(1, n):
        p_pred = p + q
        k = 1_000_000 * p_pred // (p_pred + r)
        d = 1000 * y[t] - x
        x = x + (k * d // 1_000_000 if d >= 0
                 else -(k * (-d) // 1_000_000))
        p = (1_000_000 - k) * p_pred // 1_000_000
        rows.append((t, y[t], x, k, p))
    out = pd.DataFrame(rows, columns=[
        "day_idx", "n_count", "x_milli", "k_ppm", "p_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def colley_rank_int(counts: list, names: list) -> pd.DataFrame:
    """Colley-matrix rating (Colley 2002, the BCS rating) — LEAST-
    SQUARES SPORTS RATING, a family the surface lacked: log5 and
    pythagorean_wins rate teams from win PROBABILITY models, but
    Colley solves a LINEAR SYSTEM — (2I + G)r = 1 + (w − l)/2 —
    whose bias-free property is structural: the all-ones row sums
    force mean(r) = 1/2 EXACTLY regardless of results (row sums of
    C are 2 because the game counts cancel, so 2·Σr = Σb = 3 —
    derived in this docstring and pinned as the exact integer
    identity Σ(adj(C)·b₂)ᵢ == 3·det(C)).  Games: each hour, each
    pair of the three types plays; strictly larger hourly count
    wins, ties are NO GAME (stated).  Exact Cramer arithmetic on
    the reused ``linalg.mat3_det`` / ``mat3_adj_dot`` (the
    leontief_io discipline) with b DOUBLED so b₂ = 2 + w − l is
    integer; rating_ppm = 10⁶·(adj·b₂)ᵢ // (2·det), SIGN-SPLIT
    for safety though Colley ratings live in (0,1).  Pinned: the
    no-games corpus reads exactly 500000 each, the
    beats-everyone team ranks first, ratings match a Fraction
    Gaussian solve on 30 seeded draws, the mean identity on every
    draw, and relabel symmetry."""
    from documentai_ray.stages.linalg import mat3_adj_dot, mat3_det

    g = [[0] * 3 for _ in range(3)]
    w = [0] * 3
    for row in counts:
        cs = [int(v) for v in row]
        for i in range(3):
            for j in range(i + 1, 3):
                if cs[i] > cs[j]:
                    g[i][j] += 1
                    g[j][i] += 1
                    w[i] += 1
                elif cs[j] > cs[i]:
                    g[i][j] += 1
                    g[j][i] += 1
                    w[j] += 1
    t = [sum(g[i]) for i in range(3)]
    losses = [t[i] - w[i] for i in range(3)]
    c = [[(2 + t[i]) if i == j else -g[i][j] for j in range(3)]
         for i in range(3)]
    b2 = [2 + w[i] - losses[i] for i in range(3)]
    det = mat3_det(c)
    ys = mat3_adj_dot(c, b2)
    assert sum(ys) == 3 * det          # the mean-1/2 theorem, exact
    rows = []
    for i in range(3):
        num = 1_000_000 * ys[i]
        den = 2 * det
        rating = num // den if num >= 0 else -((-num) // den)
        rows.append((str(names[i]), t[i], w[i], losses[i], rating))
    out = pd.DataFrame(rows, columns=[
        "event_type", "games", "wins", "losses", "rating_ppm"])
    for col in out.columns:
        if col != "event_type":
            out[col] = out[col].astype("int64")
    return out


def hash_occupancy_int(bucket4096: list, n_users: int,
                       d_grid: list = (64, 256, 1024, 4096)
                       ) -> pd.DataFrame:
    """Birthday-collision occupancy audit of the Knuth
    multiplicative hash — OCCUPANCY THEORY, a family the surface
    lacked: users_sketch/hll/kmv ESTIMATE cardinality, but "how
    evenly does a hash spread U keys over D buckets, against the
    birthday-problem benchmark E[colliding pairs] = C(U,2)/D" is
    the occupancy question.  ``bucket4096`` is the (h % 4096,
    distinct-user count) census with h = (id·2654435761) mod 2³²
    (Knuth's golden-ratio multiplier — exact integers both
    engines); every coarser grid level divides 4096, so
    (h % 4096) % D == h % D and ONE bounded exchange serves the
    whole grid (stated — the reason the grid is powers of 4).
    Observed colliding pairs Σ C(m_b, 2) are exact integers;
    expected_milli = 1000·U(U−1) // (2D) is one floor;
    ratio_ppm = 10⁶·2D·obs // (U(U−1)) the other.  max_load rides
    along.  Pinned: the textbook birthday numbers (U = 23,
    D = 365 reads expected 693 milli-pairs — the 0.507-collision
    classroom fact in pair form), the perfectly-uniform census
    (obs = D·C(U/D, 2) exactly, ratio = 10⁶·(U−D)/(U−1) // 1),
    the all-in-one-bucket extreme (ratio = 10⁶·D·(…)), and exact
    replays.  Envelope: id·2654435761 caps ids at ~3.4·10⁹ inside
    BIGINT in the mirror — documented."""
    cells = {int(b): int(m) for b, m in bucket4096}
    u = int(n_users)
    if u < 2:
        raise ValueError("need >= 2 users")
    rows = []
    for d in d_grid:
        d = int(d)
        agg = {}
        for b, m in cells.items():
            agg[b % d] = agg.get(b % d, 0) + m
        obs = sum(m * (m - 1) // 2 for m in agg.values())
        exp_milli = 1000 * u * (u - 1) // (2 * d)
        ratio = 1_000_000 * 2 * d * obs // (u * (u - 1))
        rows.append((d, u, obs, exp_milli, ratio,
                     max(agg.values())))
    out = pd.DataFrame(rows, columns=[
        "d_buckets", "n_users", "colliding_pairs",
        "expected_milli", "ratio_ppm", "max_load"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _conway_l(a: str, b: str) -> int:
    """Conway leading number L(A,B) = Σ_k 2^(k−1)·[last k of A ==
    first k of B] — the overlap algebra behind Penney's game."""
    n = len(a)
    return sum(2 ** (k - 1) for k in range(1, n + 1)
               if a[n - k:] == b[:k])


def penney_game_int(bits: list) -> pd.DataFrame:
    """Penney's game pattern odds (Conway's algorithm) —
    NONTRANSITIVE GAMES, a family the surface lacked: every rating
    op on the surface (colley, log5, copeland) presumes a
    meaningful total order, but Penney's game is the canonical
    proof that 'beats' need not be transitive: for EVERY 3-flip
    pattern the response (¬b₂, b₁, b₂) wins with probability
    > 1/2, so the beating relation cycles.  The exact win odds
    come from Conway's leading numbers — odds(B first) =
    (L(A,A) − L(A,B)) : (L(B,B) − L(B,A)) with L(X,Y) =
    Σ 2^(k−1)·[suffix_k(X) = prefix_k(Y)] — an unproven-looking
    magic formula which the tests VERIFY against a first-
    principles Markov absorption solve in Fractions for all 56
    ordered pattern pairs, plus the famous 7/8 (THH over HHH),
    3/4 and 2/3 classics.  Data enters as the daily-count PARITY
    stream: first_day = first 0-based day index whose trailing 3
    parities spell the pattern (−1 = never, stated).  One ppm
    floor per row.  beats_half certifies the nontransitivity on
    every row."""
    bs = [int(v) % 2 for v in bits]
    n = len(bs)
    pats = [format(i, "03b") for i in range(8)]
    rows = []
    for p in pats:
        killer = ("1" if p[1] == "0" else "0") + p[0] + p[1]
        laa = _conway_l(p, p)
        lab = _conway_l(p, killer)
        lbb = _conway_l(killer, killer)
        lba = _conway_l(killer, p)
        num = laa - lab
        den = (laa - lab) + (lbb - lba)
        win = 1_000_000 * num // den
        first = -1
        for t in range(2, n):
            if f"{bs[t - 2]}{bs[t - 1]}{bs[t]}" == p:
                first = t
                break
        rows.append((p, killer, first, win,
                     1 if 2 * num > den else 0))
    out = pd.DataFrame(rows, columns=[
        "pattern", "killer", "first_day", "win_ppm",
        "beats_half"])
    for c in ("first_day", "win_ppm", "beats_half"):
        out[c] = out[c].astype("int64")
    return out


def logistic_map_int(x0_ppm: int, r_grid_milli: list,
                     steps: int = 60) -> pd.DataFrame:
    """Floored logistic map x ← r·x·(1−x) (May 1976) — DISCRETE
    DYNAMICAL SYSTEMS / CHAOS, a family the surface lacked:
    sir_epidemic and lotka_volterra iterate population MODELS to
    their equilibria, but the logistic map is THE object where the
    same one-liner runs fixed point → 2-cycle → 4-cycle → chaos as
    r climbs, and the floored chain makes every regime an EXACT
    integer question: x′_ppm = r_milli·x·(10⁶ − x) // 10⁹, one
    floor per step (the mm1/erlang chain discipline), 60 steps per
    r.  Period detection is EXACT equality (a floored map that has
    converged repeats bit-for-bit): smallest p ∈ {1,2,4,8} with
    x_T == x_{T−p}, else 0 = no short cycle (the floored-chaos
    caveat: any finite-state map ultimately cycles, but not within
    these lags — stated).  Pinned: r = 2.5 lands EXACTLY on the
    algebraic fixed point 1 − 1/r = 600000 ppm (the fixed point is
    floor-invariant: 2500·600000·400000 // 10⁹ = 600000, checked
    in-kernel), r = 3.2 reads period 2 with the cycle bracketing
    the algebraic pair (513044, 799455) within 3 ppm, r = 3.9
    reads period 0 AND sensitive dependence (two starts 1 ppm
    apart separate by > 10⁵ within 60 steps — Lorenz's butterfly
    as an assertion).  Mirror: recursive CTE carrying the 8-lag
    ring as columns."""
    rows = []
    for r in r_grid_milli:
        r = int(r)
        x = int(x0_ppm)
        hist = []
        for _ in range(int(steps)):
            hist.append(x)
            x = r * x * (1_000_000 - x) // 1_000_000_000
        hist.append(x)
        period = 0
        for p in (1, 2, 4, 8):
            if hist[-1] == hist[-1 - p]:
                period = p
                break
        rows.append((r, int(x0_ppm), x, period))
    out = pd.DataFrame(rows, columns=[
        "r_milli", "x0_ppm", "x_final_ppm", "period"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def cf_convergents_int(p: int, q: int) -> pd.DataFrame:
    """Continued-fraction convergents of the measured ratio p/q —
    DIOPHANTINE APPROXIMATION, a family the surface lacked: the
    surface measures plenty of ratios (shares, rates, indexes) but
    never asks the number-theoretic question "what is the BEST
    simple fraction for this measurement?", which continued
    fractions answer optimally: the convergents hᵢ/kᵢ from the
    Euclid quotients aᵢ (h recurrence hᵢ = aᵢh₍ᵢ₋₁₎ + h₍ᵢ₋₂₎) are
    EXACTLY the best rational approximations OF THE SECOND KIND —
    from step 1 on, no fraction h′/k′ with k′ ≤ k makes |k′x − h′|
    smaller (the classical theorem; first-kind |x − h/k|
    optimality can fail at the 0th convergent, which is why the
    statement is the second-kind one) — verified in tests by brute
    force over every smaller denominator rather than cited.  ZERO floors — pure Euclid.  side =
    sign(h·q − p·k) records the famous alternation (convergents
    straddle the target, even index below, odd above, last one
    exact = 0 — pinned), and the last convergent equals p/q in
    lowest terms (Euclid's gcd, pinned).  Fibonacci-ratio inputs
    (all-ones quotients, the golden-ratio worst case of the
    theory) and the [3; 7, 16] expansion of 355/113 are hand
    pins.  Mirror: a recursive-CTE Euclid carrying (remainders,
    h-pair, k-pair)."""
    p, q = int(p), int(q)
    if q <= 0 or p < 0:
        raise ValueError("need p >= 0, q > 0")
    r0, r1 = p, q
    hm2, hm1 = 0, 1       # h_{-2}=0? standard: h_{-1}=1, h_{-2}=0
    km2, km1 = 1, 0
    rows = []
    i = 0
    a, r0, r1 = r0 // r1, r1, r0 % r1
    while True:
        h = a * hm1 + hm2
        k = a * km1 + km2
        d = h * q - p * k
        rows.append((i, a, h, k, (d > 0) - (d < 0)))
        if r1 == 0:
            break
        hm2, hm1 = hm1, h
        km2, km1 = km1, k
        a, r0, r1 = r0 // r1, r1, r0 % r1
        i += 1
    out = pd.DataFrame(rows, columns=[
        "step", "a_quot", "num", "den", "side"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out

__all__ = sorted(set(_PREV_ALL) | set(['BH_CRITS_M5', 'CHI2_CRIT_MICRO', 'CPM_EDGES', 'WSPT_WEIGHTS', '_CRR_DEN', '_CRR_GRID', '_CRR_N', '_CRR_PDEN', '_anova_floors', '_ballot_ranks', '_cea_int', '_conway_l', '_da_row', '_ols_centered', '_ss_scaled', 'acceptance_sampling_int', 'adjusted_winner_int', 'airport_game_int', 'anova_oneway_int', 'backlog_dam_int', 'ballot_walk_int', 'banzhaf_int', 'bh_stepup_int', 'borda_int', 'brown_forsythe_int', 'buhlmann_int', 'cf_convergents_int', 'chi2_independence_int', 'colley_rank_int', 'cooks_distance_int', 'copeland_int', 'critical_path_int', 'crr_option_int', 'dhondt_int', 'dm_test_int', 'double_auction_int', 'durbin_watson_int', 'engset_int', 'erdos_gallai_int', 'erlang_b_int', 'erlang_c_int', 'fleiss_kappa_int', 'friedman_int', 'grouped_kendall_int', 'h_g_index_fold', 'hamilton_int', 'hamming74_int', 'hardy_weinberg_int', 'hash_occupancy_int', 'irv_int', 'iv_wald_int', 'johnson_flowshop_int', 'kalman_level_int', 'kelly_int', 'koon_reliability_int', 'kruskal_wallis_int', 'lin_ccc_int', 'littlewood_int', 'loan_amortization_int', 'log5_matchup_int', 'logistic_map_int', 'lotka_volterra_int', 'luhn_check_digit_int', 'luhn_sum_int', 'luhn_valid_int', 'meta_fixed_int', 'mg1_pk_int', 'mm1_metrics_int', 'mood_scale_int', 'myerson_reserve_int', 'naive_bayes_int', 'nash_2x2_int', 'nw_transport_int', 'penney_game_int', 'pivotal_by_size_int', 'portfolio_minvar_int', 'position_auction_int', 'pythagorean_wins_int', 'record_values_int', 'secretary_int', 'shapley_shubik_int', 'sir_epidemic_int', 'stochastic_dominance_int', 'stoploss_layers_int', 'system_reliability_int', 'talmud_split_int', 'wspt_objective_int', 'zerosum_value_int']))
