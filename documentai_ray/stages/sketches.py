"""Mergeable cardinality sketches: KMV (k-minimum-values) distinct count.

The classic distributed distinct-count problem — "how many distinct
3-gram shingles does the corpus contain?" — needs a full shuffle if
answered exactly (``unique`` over 10¹² values). The KMV sketch
(Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-Value Synopses")
answers it with a BOUNDED, mergeable state: keep the k smallest distinct
hash values; if fewer than k exist the count is exact, otherwise
``(k-1) · 2⁶⁴ / h_k`` estimates the cardinality with relative error
≈ 1/√(k-2).

Why it oracles bit-exactly (unlike HyperLogLog implementations that
differ in bias-correction tables): the hash is the repo's standard
md5-LE64, the merge is "union then k smallest" (order-free), and the
estimator is pure integer math — DuckDB reproduces the identical
estimate in HUGEINT arithmetic.

Physical plan: each batch emits its k smallest DISTINCT shingle hashes
(≤ k rows/batch, a few KB); the driver merges the partials — the only
data that ever leaves a worker is sketch-sized. At 10¹² docs add one
intermediate combine ``map_batches`` if the partial stream itself gets
wide; the merge is associative so any tree shape works.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

U64 = 1 << 64


def md5_le64(s: str) -> int:
    """The repo-standard u64 string hash (md5, first 8 bytes, LE)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _shingles(text: str, k: int = 3):
    toks = [t for t in text.split() if t]
    for i in range(len(toks) - k + 1):
        yield " ".join(toks[i:i + k])


def kmv_estimate(hashes: np.ndarray, k: int) -> tuple[int, int]:
    """(n_kept, estimate) from distinct sorted u64 hashes. Exact below k."""
    hashes = np.unique(hashes)
    if len(hashes) < k:
        return len(hashes), int(len(hashes))
    hk = int(hashes[k - 1])
    return k, (k - 1) * U64 // hk


def kmv_distinct_shingles(ds, *, text_col: str = "text", k: int = 128,
                          shingle: int = 3):
    """Corpus-wide distinct 3-shingle estimate. Returns a one-row table
    ``(k, n_kept, est_distinct)``."""

    def partial(batch: pa.Table) -> pa.Table:
        hs: set[int] = set()
        for t in batch.column(text_col).to_pylist():
            for sh in _shingles(t or "", shingle):
                hs.add(md5_le64(sh))
        arr = np.fromiter(hs, np.uint64, count=len(hs))
        if len(arr) > k:
            arr = np.partition(arr, k)[:k]
        return pa.table({"h": pa.array(np.sort(arr), pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = parts["h"].to_numpy().astype(np.uint64)
    n_kept, est = kmv_estimate(merged, k)
    return pa.table({"k": pa.array([k], pa.int64()),
                     "n_kept": pa.array([n_kept], pa.int64()),
                     "est_distinct": pa.array([est], pa.int64())})


# ---------------------------------------------------------------------------
# HyperLogLog distinct count (register-merge sketch, bit-exact oracle)
# ---------------------------------------------------------------------------

HLL_P = 10                     # 2^10 = 1024 registers
HLL_M = 1 << HLL_P
# alpha_m in ppm for m=1024 (Flajolet et al. 2007): the ONE shared
# constant — __ray_entry__'s SQL oracle formats this same value, so the
# Python estimator and the HUGEINT SQL mirror can never drift.
HLL_ALPHA_PPM = 720541


def hll_rho(r: int, p: int = HLL_P) -> int:
    """Position of the leftmost 1-bit of the (64-p)-bit remainder
    (1-indexed); r == 0 → 64-p+1. Pure integer (no float log2 — values
    near 2^53 would round before flooring)."""
    return (64 - p) + 1 - r.bit_length()


def hll_estimate_raw(registers: np.ndarray, p: int = HLL_P,
                     alpha_ppm: int = HLL_ALPHA_PPM) -> tuple[int, int]:
    """(n_zero, raw estimate) from the m max-rho registers, exact integer
    math end to end: the harmonic sum Σ 2^-M_j is kept as the integer
    Σ 2^(64-M_j) (denominator 2^64 factored into the final division), so
    DuckDB reproduces the identical value in HUGEINT arithmetic. The raw
    estimator is the scale-stable contract; the small-range linear-count
    correction (`hll_corrected`) involves ln() and stays a Python-side
    convenience, not an oracle surface."""
    m = 1 << p
    assert len(registers) == m
    n_zero = int((registers == 0).sum())
    s_scaled = sum(1 << (64 - int(v)) for v in registers)
    est = alpha_ppm * m * m * (1 << 64) // (10 ** 6 * s_scaled)
    return n_zero, est


def hll_corrected(registers: np.ndarray, p: int = HLL_P) -> int:
    """User-facing estimate with the standard small-range correction:
    linear counting m·ln(m/V) when the raw estimate ≤ 2.5m and zero
    registers exist (Flajolet et al. 2007 §4)."""
    import math

    m = 1 << p
    n_zero, est = hll_estimate_raw(registers, p)
    if est <= 5 * m // 2 and n_zero > 0:
        return int(round(m * math.log(m / n_zero)))
    return est


def hll_distinct_shingles(ds, *, text_col: str = "text", p: int = HLL_P,
                          shingle: int = 3):
    """Corpus-wide distinct 3-shingle HyperLogLog estimate. Returns a
    one-row table ``(m, n_zero, est_raw)``.

    Physical plan: each batch updates a local m-register array and emits
    only its NON-ZERO registers as (bucket, rho) pairs (≤ m rows ≈ a few
    KB per batch); a 1024-group ``groupby(bucket).max(rho)`` merges them
    — register max-merge is associative/commutative, so the result is
    identical at any parallelism and any combine-tree shape. Nothing
    data-sized ever moves: this is the sketch to prefer over KMV when
    the distinct count must keep streaming in (registers never grow),
    vs KMV's exact-below-k behavior for small cardinalities.
    """
    from ray.data.aggregate import Max

    m = 1 << p
    mask = np.uint64(m - 1)

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.int64)
        for t in batch.column(text_col).to_pylist():
            for sh in _shingles(t or "", shingle):
                h = md5_le64(sh)
                b = h & int(mask)
                rho = hll_rho(h >> p, p)
                if rho > regs[b]:
                    regs[b] = rho
        nz = np.nonzero(regs)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "rho": pa.array(regs[nz], pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Max("rho", alias_name="mrho"))
              .to_pandas())
    regs = np.zeros(m, np.int64)
    regs[merged["bucket"].to_numpy()] = merged["mrho"].to_numpy()
    n_zero, est = hll_estimate_raw(regs, p)
    return pa.table({"m": pa.array([m], pa.int64()),
                     "n_zero": pa.array([n_zero], pa.int64()),
                     "est_raw": pa.array([est], pa.int64())})


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (two bounded passes, no token shuffle)
# ---------------------------------------------------------------------------

_MG_TOTAL_SENTINEL = "\x00__total__"


def misra_gries(tokens, k: int) -> dict[str, int]:
    """Classic Misra-Gries summary with k counters: every item with true
    frequency > n/(k+1) is guaranteed a counter, and each counter
    undercounts by at most n/(k+1) (Misra & Gries 1982)."""
    counts: dict[str, int] = {}
    for t in tokens:
        if t in counts:
            counts[t] += 1
        elif len(counts) < k:
            counts[t] = 1
        else:
            dead = [key for key in counts if counts[key] == 1]
            for key in counts:
                counts[key] -= 1
            for key in dead:
                del counts[key]
    return counts


def heavy_hitter_tokens(ds, *, text_col: str = "text", k: int = 30):
    """Corpus tokens with frequency STRICTLY above n/(k+1) and their EXACT
    counts — without ever shuffling the token stream.

    Pass 1: each batch ships its k-counter Misra-Gries summary (≤ k+1
    rows). Summing per-batch counters preserves the MG bound, so the
    union of summary keys is a guaranteed SUPERSET of every true heavy
    hitter — candidate recall is exact by construction, not probabilistic.
    Pass 2: the candidate set broadcasts (≤ k × n_batches strings; at
    10¹² docs insert a tree combine in pass 1 to keep it k-sized) and
    each batch ships exact per-candidate counts; a vocabulary-bounded
    groupby sums them and the integer filter ``cnt·(k+1) > n`` needs no
    float margin. Returns ``(token, n_count)``.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column(text_col).to_pylist():
            toks.extend((t or "").split())
        mg = misra_gries(toks, k)
        keys = list(mg) + [_MG_TOTAL_SENTINEL]
        vals = [mg[t] for t in mg] + [len(toks)]
        return pa.table({"token": pa.array(keys, pa.string()),
                         "cnt": pa.array(vals, pa.int64())})

    p1 = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(p1.loc[p1["token"] == _MG_TOTAL_SENTINEL, "cnt"].sum())
    candidates = sorted(set(p1["token"]) - {_MG_TOTAL_SENTINEL})
    cand_ref = ray.put(frozenset(candidates))

    def exact(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        counts: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            for tok in (t or "").split():
                if tok in cand:
                    counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"token": pa.array(list(counts), pa.string()),
                         "cnt": pa.array(list(counts.values()), pa.int64())})

    agg = (ds.map_batches(exact, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("cnt", alias_name="n_count")))

    def keep(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n_count").to_pylist(), np.int64)
        return batch.filter(pa.array(n * (k + 1) > total))

    return agg.map_batches(keep, batch_format="pyarrow")


def grouped_kmv_distinct(ds, *, key_col: str, val_col: str, k: int = 128):
    """Per-group distinct-count KMV sketch — the scale path past exact
    ``COUNT(DISTINCT)`` per key (``aggregates.grouped_count_distinct``
    shuffles every distinct (key, val) pair; this ships ≤ k hashes per
    key per batch regardless of value cardinality). Exact below k per
    group, ``(k−1)·2⁶⁴ // h_k`` above — the same integer estimator and
    md5-LE64 hash as the corpus-wide sketch, so the SQL mirror is a
    row_number window + one HUGEINT division per group.

    Plan: per-batch per-key k-min distinct hashes (vectorized pandas
    groupby), ONE (key, h) exchange of sketch rows, per-key merge =
    union + re-truncate (associative). Returns
    ``(key, n_kept, est_distinct)``."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        df["h"] = [md5_le64(str(v)) for v in df[val_col]]
        df = df.drop_duplicates([key_col, "h"])
        df["h"] = df["h"].astype(np.uint64)
        df = df.sort_values([key_col, "h"], kind="mergesort")
        df = df.groupby(key_col, sort=False).head(k)
        return pa.Table.from_pandas(df[[key_col, "h"]],
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(g["h"].to_numpy(np.uint64))
        n_kept, est = kmv_estimate(hs, k)
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "n_kept": np.array([n_kept], np.int64),
                             "est_distinct": np.array([est], np.int64)})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(merge, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimates, mergeable counter grid)
# ---------------------------------------------------------------------------

CM_W = 1024
CM_D = 4


def cm_buckets(token: str, d: int = CM_D, w: int = CM_W) -> list:
    """The d row-buckets of a token: independent hashes via the repo
    hash with a row-salt prefix (md5-LE64 of "<i>:<token>") mod w."""
    return [md5_le64(f"{i}:{token}") % w for i in range(d)]


def cm_sketch_tokens(ds, *, text_col: str = "text", d: int = CM_D,
                     w: int = CM_W) -> np.ndarray:
    """Build the (d, w) Count-Min counter grid over the corpus token
    stream (Cormode & Muthukrishnan 2005): est(t) = min_i C[i][h_i(t)]
    NEVER underestimates and overestimates by ≤ εN with prob 1−δ
    (ε = e/w, δ = e^−d). Counter addition is associative, so each batch
    ships only its non-zero counters as (row, bucket, n) triples
    (≤ d·w rows ≈ KBs) and a bounded groupby-sum merges them — the same
    sketch-sized-state contract as KMV/HLL. Complements Misra-Gries:
    MG answers "which tokens are heavy" exactly; CM answers "how often
    does THIS token occur" for any token without a second pass."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        grid = np.zeros((d, w), np.int64)
        counts: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            counts.update((t or "").split())
        for tok, n in counts.items():
            for i, b in enumerate(cm_buckets(tok, d, w)):
                grid[i, b] += n
        rows, buckets = np.nonzero(grid)
        return pa.table({"row": pa.array(rows, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "n": pa.array(grid[rows, buckets], pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["row", "bucket"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    grid = np.zeros((d, w), np.int64)
    grid[merged["row"].to_numpy(), merged["bucket"].to_numpy()] = \
        merged["n"].to_numpy()
    return grid


def cm_estimate(grid: np.ndarray, token: str) -> int:
    d, w = grid.shape
    return int(min(grid[i, b] for i, b in enumerate(cm_buckets(token, d, w))))


# ---------------------------------------------------------------------------
# AMS F2 sketch (second frequency moment / self-join size estimation)
# ---------------------------------------------------------------------------

AMS_D = 8


def ams_sign(row: int, key: str) -> int:
    """±1 four-wise-ish sign for estimator row ``row`` — lowest bit of
    the salted repo hash."""
    return 1 if md5_le64(f"ams{row}:{key}") & 1 else -1


def ams_f2_sketch(ds, *, key_col: str, d: int = AMS_D):
    """F2 = Σ_k f_k² (the SELF-JOIN SIZE over ``key_col`` — the number a
    join planner wants before committing to a shuffle) estimated by the
    AMS sketch (Alon-Matias-Szegedy 1996): d independent counters
    Z_j = Σ_k f_k·s_j(k); each Z_j² is an unbiased F2 estimate and the
    LOWER MEDIAN of the d squares is the reported value — integers end
    to end (signs from the salted repo hash, no float variance math), so
    the SQL mirror lands bit-identically.

    Plan: each batch pre-counts its keys once and ships ONE d-vector of
    partial Z's (counter addition is associative — the same sketch-sized
    exchange as KMV/HLL/CM); a d-row groupby-sum merges. Returns a
    one-row table ``(d, est_f2)``."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter(batch.column(key_col).to_pylist())
        z = np.zeros(d, np.int64)
        for k, n in counts.items():
            for j in range(d):
                z[j] += n * ams_sign(j, str(k))
        return pa.table({"j": pa.array(range(d), pa.int64()),
                         "z": pa.array(z, pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("j").aggregate(Sum("z", alias_name="z"))
              .to_pandas())
    sq = np.sort((merged["z"].to_numpy(np.int64).astype(object)) ** 2)
    est = int(sq[(d - 1) // 2])          # lower median, exact integer
    return pa.table({"d": pa.array([d], pa.int64()),
                     "est_f2": pa.array([est], pa.int64())})


def _kmv_side_sketch(ds, *, val_col: str, k: int) -> np.ndarray:
    """One side's KMV sketch: the k smallest distinct md5-LE64 value
    hashes, ≤ k rows per block crossing the wire."""

    def partial(batch: pa.Table) -> pa.Table:
        hs = {md5_le64(str(v))
              for v in batch.column(val_col).to_pylist()}
        arr = np.unique(np.fromiter(hs, np.uint64, count=len(hs)))
        if len(arr) > k:
            arr = arr[:k]
        return pa.table({"h": pa.array(arr, pa.uint64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas()["h"].to_numpy().astype(np.uint64))
    s = np.unique(parts)
    return s[:k] if len(s) > k else s


def _kmv_combine(sa: np.ndarray, sb: np.ndarray, k: int) -> dict:
    """θ-sketch algebra on two KMV sketches: θ = k-th of the union
    sketch; below θ both sketches are exact samples, so common /
    only-a / only-b counts scale by est_union/denominator. Collapses to
    exact counts when the union holds < k. All integer."""
    u = np.unique(np.concatenate([sa, sb]))
    if len(u) >= k:
        theta, nu = int(u[k - 1]), k
        est_union = (k - 1) * U64 // theta
    else:
        theta, nu = int(u[-1]) if len(u) else 0, len(u)
        est_union = len(u)          # both sides exact below k
    th = np.uint64(theta)
    common = int((np.intersect1d(sa, sb) <= th).sum())
    a_below = int((sa <= th).sum())
    b_below = int((sb <= th).sum())
    scale = (lambda c: c * est_union // nu) if nu else (lambda c: 0)
    return {"k": k, "nu": nu, "theta": theta, "common": common,
            "est_union": int(est_union),
            "est_intersect": scale(common),
            "est_only_a": scale(a_below - common),
            "est_only_b": scale(b_below - common)}


def kmv_intersect_sets(ds_a, ds_b, *, val_col: str, k: int = 64):
    """KMV θ-sketch SET INTERSECTION estimate — |A ∩ B| distinct without
    co-locating the sets (the audience-overlap / cross-corpus-overlap
    question): each side keeps its k smallest distinct value hashes
    (≤ k rows per block cross the wire, regardless of cardinality); the
    driver-side combine is pure sketch algebra on ≤ 2k integers
    (Beyer et al. 2007 / theta-sketch family; see ``_kmv_combine``).
    Integer end to end — the SQL mirror lands bit-identically. Returns
    one row ``(k, n_union_kept, common, est_union, est_intersect)``."""
    st = _kmv_combine(_kmv_side_sketch(ds_a, val_col=val_col, k=k),
                      _kmv_side_sketch(ds_b, val_col=val_col, k=k), k)
    return pa.table({"k": pa.array([k], pa.int64()),
                     "n_union_kept": pa.array([st["nu"]], pa.int64()),
                     "common": pa.array([st["common"]], pa.int64()),
                     "est_union": pa.array([st["est_union"]], pa.int64()),
                     "est_intersect": pa.array([st["est_intersect"]],
                                               pa.int64())})


def kmv_difference_sets(ds_a, ds_b, *, val_col: str, k: int = 64):
    """KMV θ-sketch SET DIFFERENCE estimate — |A \\ B| (and |B \\ A|)
    distinct, completing the sketch set algebra beside union and
    intersection: below the shared θ both sketches are exact samples,
    so the members of A's sketch NOT in B's estimate the difference at
    the same scale factor. Exact when the union sketch holds < k.
    Returns one row
    ``(k, n_union_kept, est_union, est_only_a, est_only_b)``."""
    st = _kmv_combine(_kmv_side_sketch(ds_a, val_col=val_col, k=k),
                      _kmv_side_sketch(ds_b, val_col=val_col, k=k), k)
    return pa.table({"k": pa.array([k], pa.int64()),
                     "n_union_kept": pa.array([st["nu"]], pa.int64()),
                     "est_union": pa.array([st["est_union"]], pa.int64()),
                     "est_only_a": pa.array([st["est_only_a"]], pa.int64()),
                     "est_only_b": pa.array([st["est_only_b"]],
                                            pa.int64())})


def log2_quantile_sketch(ds, *, key_col: str, val_col: str,
                         q_pct: int = 99):
    """DDSketch-style bounded quantile summary per key: bucket every
    positive integer value by ``floor(log2(v))`` (64 buckets cover the
    whole int64 domain — the sketch size is FIXED no matter the value
    distribution, unlike the exact-histogram quantile ops whose
    exchange is bounded by distinct values), then read the q-th
    percentile off the cumulative bucket counts. The answer is an
    INTERVAL ``[2^b, 2^(b+1)-1]`` — a guaranteed relative error ≤ 2×,
    the trade the sketch makes for its O(keys × 64) state; tighter
    error wants more buckets per octave — that finer variant exists as
    ``aggregates.grouped_quantile_sketch`` (HDR 16-sub-bucket octaves,
    ≤ 1/16 relative error); this one is the SQL-mirrorable coarse form
    (``length(bin(v))−1`` IS the bucket fn, so the oracle is exact).

    Rank rule: the target bucket is the first whose inclusive
    cumulative count reaches ``ceil(q·n/100)`` (integer test
    ``cum·100 ≥ q·n`` — no float), matching the SQL mirror bit-exactly.

    Physical plan: per-batch (key, bucket) count partials (bucket via
    ``np.frexp`` — exact for v < 2⁵³, no log-boundary misrounding) →
    ONE exchange bounded by keys × 64 → driver cumulative fold.
    Contract: values must be ≥ 1 (raise otherwise — clamp or shift
    upstream; zero/negative have no octave)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if not 1 <= q_pct <= 100:
        raise ValueError(f"q_pct must be in [1, 100], got {q_pct}")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        v = df[val_col].to_numpy().astype(np.int64)
        if len(v) and v.min() < 1:
            raise ValueError("log2_quantile_sketch requires values >= 1")
        # frexp: v = m * 2^e with m in [0.5, 1) -> floor(log2 v) = e - 1
        _, e = np.frexp(v.astype(np.float64))
        df["_b"] = (e - 1).astype(np.int64)
        g = (df.groupby([key_col, "_b"], as_index=False).size()
             .rename(columns={"size": "_n"}))
        return pa.Table.from_pandas(
            g[[key_col, "_b", "_n"]],
            preserve_index=False).replace_schema_metadata(None)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "_b"])
            .aggregate(Sum("_n", alias_name="_n"))).to_pandas()

    rows = []
    for key, g in hist.groupby(key_col, sort=False):
        g = g.sort_values("_b", kind="mergesort")
        cum = g["_n"].cumsum().to_numpy()
        n = int(cum[-1])
        hit = np.nonzero(cum * 100 >= q_pct * n)[0][0]
        b = int(g["_b"].to_numpy()[hit])
        rows.append((key, n, b, 1 << b, (1 << (b + 1)) - 1))
    out = pd.DataFrame(rows, columns=[key_col, "n", "q_bucket",
                                      "q_lo", "q_hi"])
    return pa.Table.from_pandas(out, preserve_index=False) \
                   .replace_schema_metadata(None)


def countmin_cols(token: str, d: int = 4, w: int = 256) -> list[int]:
    """The d column indices of a token in the count-min sketch: ONE md5,
    d disjoint 16-bit hex slices (chars [4i, 4i+4)), each % w.  One hash
    per token on BOTH engines — the SQL mirror carves the same nibbles
    out of the same md5 hex, so cells land bit-identically.  d ≤ 8
    (md5 has eight 16-bit slices); w ≤ 65536."""
    h = hashlib.md5(token.encode("utf-8")).hexdigest()
    return [int(h[4 * i:4 * i + 4], 16) % w for i in range(d)]


def countmin_cells(ds, *, text_col: str = "text", d: int = 4,
                   w: int = 256) -> "pd.DataFrame":
    """Build a count-min sketch over the corpus token stream (tokens =
    single-space split, empties counted — the top_tokens convention).

    The CMS is the mergeable fixed-size frequency summary: d·w counters
    regardless of vocabulary, point estimate = min over d rows of the
    addressed cells, ALWAYS ≥ the true count (only collisions inflate,
    nothing decrements).  Physical plan: per-batch token Counter →
    hash each DISTINCT token once → (row, col) partial counts (≤ d·w
    rows per batch, the map-side combine) → ONE exchange bounded by
    d·w cells total.  Returns the cell table as a small pandas frame
    ``(row, col, c)`` — the sketch itself, 4·256 ints here, broadcast-
    free driver state."""
    import collections

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cnt = collections.Counter()
        for t in batch.column(text_col).to_pylist():
            cnt.update((t or "").split(" "))
        cells: dict[tuple[int, int], int] = {}
        for tok, n in cnt.items():
            for i, col in enumerate(countmin_cols(tok, d, w)):
                k = (i, col)
                cells[k] = cells.get(k, 0) + n
        rows = sorted(cells)
        return pa.table({
            "row": pa.array([r for r, _ in rows], pa.int64()),
            "col": pa.array([c for _, c in rows], pa.int64()),
            "c": pa.array([cells[k] for k in rows], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["row", "col"])
            .aggregate(Sum("c", alias_name="c"))).to_pandas()


def countmin_estimate(cells: "pd.DataFrame", tokens: list[str], *,
                      d: int = 4, w: int = 256) -> list[int]:
    """Point-estimate each token's count from the cell table: min over
    the d addressed counters.  Guaranteed ≥ the true count (the CMS
    one-sided error contract — asserted by the oracle query, which
    reports over_est = estimate − exact ≥ 0 per probe)."""
    grid = np.zeros((d, w), dtype=np.int64)
    grid[cells["row"].to_numpy(), cells["col"].to_numpy()] = \
        cells["c"].to_numpy()
    return [int(min(grid[i, col]
                    for i, col in enumerate(countmin_cols(tok, d, w))))
            for tok in tokens]


def bloom_positions(key: str, m: int = 4096, kh: int = 3) -> list[int]:
    """The kh bloom-filter bit positions of a string key: ONE md5, kh
    disjoint 16-bit hex slices (the countmin_cols convention), each
    % m.  kh ≤ 8; m ≤ 65536 so every slice covers the range."""
    h = hashlib.md5(key.encode("utf-8")).hexdigest()
    return [int(h[4 * i:4 * i + 4], 16) % m for i in range(kh)]


def bloom_build_bits(ds, *, key_col: str, m: int = 4096,
                     kh: int = 3) -> np.ndarray:
    """Distributed bloom-filter build over a (small) key side: each
    batch hashes its DISTINCT keys and emits set bit positions, one
    exchange bounded by m distinct positions, driver folds to a numpy
    bool array of m bits — the broadcastable pushdown filter.  Keys are
    stringified (CAST AS VARCHAR in the mirror) so int and string key
    columns hash identically across engines."""
    def partial(batch: pa.Table) -> pa.Table:
        seen: set[int] = set()
        for k in np.unique(batch.column(key_col).to_numpy()):
            seen.update(bloom_positions(str(k), m, kh))
        return pa.table({"b": pa.array(sorted(seen), pa.int64())})

    pos = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("b").count().to_pandas())
    bits = np.zeros(m, dtype=bool)
    bits[pos["b"].to_numpy()] = True
    return bits


def bloom_semijoin_stats(fact_ds, *, key_col: str, bits_ref, truth_ref,
                         m: int = 4096, kh: int = 3):
    """Bloom-pushdown semi-join audit: filter the fact side through the
    broadcast bloom bits (candidate = ALL kh addressed bits set — no
    false negatives, only collisions pass spuriously) and measure the
    filter against the exact key set: n_fact / n_candidates / n_true /
    n_fp and the false-positive rate over true negatives in ppm.  This
    is the join-pushdown pattern for when the build side's exact key
    set is too big to broadcast but its m-bit summary isn't; the exact
    set rides along here precisely to MEASURE what the summary costs.

    Per batch: hash DISTINCT keys once, vectorized lookup, per-batch
    scalar partials → driver sum (≤|blocks| rows).  Engine asserts the
    no-false-negative contract."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        truth = ray.get(truth_ref)
        keys = batch.column(key_col).to_numpy()
        uniq, inv = np.unique(keys, return_inverse=True)
        member = np.array(
            [all(bits[p] for p in bloom_positions(str(k), m, kh))
             for k in uniq], dtype=bool)[inv]
        istrue = np.isin(keys, truth)
        assert bool(np.all(member[istrue])), \
            "bloom false negative — broken filter"
        return pa.table({
            "n_fact": pa.array([len(keys)], pa.int64()),
            "n_candidates": pa.array([int(member.sum())], pa.int64()),
            "n_true": pa.array([int(istrue.sum())], pa.int64())})

    agg = (fact_ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().sum())
    n_fact = int(agg["n_fact"])
    n_cand = int(agg["n_candidates"])
    n_true = int(agg["n_true"])
    n_fp = n_cand - n_true
    n_neg = n_fact - n_true
    import pandas as pd
    return pd.DataFrame({
        "n_fact": [n_fact], "n_candidates": [n_cand],
        "n_true": [n_true], "n_fp": [n_fp],
        "fp_ppm": [n_fp * 1_000_000 // n_neg if n_neg else 0],
    }).astype("int64")
