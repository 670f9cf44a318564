"""Approximate string matching: edit-distance fuzzy join.

The fuzzy key join a crawl pipeline needs when host/entity strings are
dirty (typos, truncation, OCR damage) and must be snapped to a canonical
vocabulary before keyed aggregation. Semantics: each dirty string is
matched to the canonical string with minimum Levenshtein distance
(unit-cost insert/delete/substitute — identical to DuckDB/Postgres
``levenshtein``), ties broken lexicographically; matches beyond
``max_dist`` are dropped.

Scale contract (the whole design): edit distance is quadratic per pair
and cannot shuffle, so the join runs on the DISTINCT dirty-key
projection — one bounded exchange dedupes the keys, the (small) distinct
set × (small) canonical vocabulary match happens once, and the resulting
mapping is broadcast (``ray.put``) and applied per batch as a plain
lookup. This is the standard fuzzy-join plan when the distinct key count
is worker-memory-small (typo'd host names, entity labels: bounded
vocabularies). For unbounded distinct keys, block first (length +
first-char banding, or q-gram LSH as in stages/dedup.py) — documented,
not implemented here.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, vectorized row DP (numpy inner loop over
    the shorter-string rows; the insertion chain is resolved with the
    (min-accumulate of tmp[k]-k)+j prefix trick instead of a scalar
    scan)."""
    if a == b:
        return 0
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return m or n
    bz = np.array(list(b))
    prev = np.arange(n + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        sub = prev[:-1] + (bz != ca)
        tmp = np.minimum(prev[1:] + 1, sub)
        # cur[j] = min(tmp[j], cur[j-1]+1) == min_{k<=j}(vals[k]) + j,
        # vals = [i, tmp[1]-1, tmp[2]-2, ...]
        vals = np.concatenate(([i], tmp - np.arange(1, n + 1)))
        prev = np.minimum.accumulate(vals) + np.arange(n + 1)
    return int(prev[-1])


def match_vocabulary(dirty: list[str], canon: list[str],
                     *, max_dist: int) -> dict[str, tuple[str, int]]:
    """Exhaustive distinct-set match: for each dirty string the argmin-
    distance canonical (lexicographic tie-break), omitted if the best
    distance exceeds ``max_dist``."""
    canon_sorted = sorted(canon)
    out: dict[str, tuple[str, int]] = {}
    for d in dirty:
        best: tuple[int, str] | None = None
        for c in canon_sorted:
            dist = levenshtein(d, c)
            if best is None or dist < best[0]:
                best = (dist, c)
        if best is not None and best[0] <= max_dist:
            out[d] = (best[1], best[0])
    return out


def fuzzy_match_join(ds, *, col: str, canon: list[str], max_dist: int,
                     matched_col: str = "canon", dist_col: str = "dist",
                     num_partitions: int = 16):
    """Snap ``ds[col]`` to the canonical vocabulary; rows whose best match
    is farther than ``max_dist`` are dropped. Physical plan: distinct
    projection of ``col`` (one bounded key-only exchange), one driver-side
    vocabulary match over the distinct set (contract: distinct count is
    small — hosts/labels, not free text), broadcast mapping, vectorized
    per-batch lookup."""
    import ray
    import zlib

    def project(batch: pa.Table) -> pa.Table:
        from documentai_ray.stages._hashutil import hash_pkey

        vals = batch.column(col)
        pk = pa.array(hash_pkey([vals], num_partitions))
        return pa.table({col: vals, "_pkey": pk})

    def distinct(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates([col])
        return pa.table({col: pa.array(df[col].astype(str), pa.string())})

    distinct_vals = [
        r[col]
        for r in ds.map_batches(project, batch_format="pyarrow")
        .groupby("_pkey").map_groups(distinct, batch_format="pyarrow")
        .take_all()
    ]
    mapping = match_vocabulary(distinct_vals, canon, max_dist=max_dist)
    map_ref = ray.put(mapping)

    def attach(batch: pa.Table) -> pa.Table:
        mp = ray.get(map_ref)
        vals = batch.column(col).to_pylist()
        hits = [mp.get(v) for v in vals]
        keep = np.array([h is not None for h in hits], dtype=bool)
        out = batch.filter(pa.array(keep))
        kept = [h for h in hits if h is not None]
        out = out.append_column(
            matched_col, pa.array([c for c, _ in kept], pa.string()))
        return out.append_column(
            dist_col, pa.array([d for _, d in kept], pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def deletion_variants(s: str):
    """SymSpell d=1 neighborhood: the string itself plus every single-
    character deletion."""
    yield s
    for i in range(len(s)):
        yield s[:i] + s[i + 1:]


def symspell_join(left_ds, right_ds, *, left_col: str, right_col: str,
                  num_partitions: int = 64):
    """FULLY-DISTRIBUTED edit-distance ≤ 1 string join via deletion-
    neighborhood hashing (the SymSpell / FastSS plan) — the scale path
    past ``fuzzy_match_join``'s documented distinct-set × vocabulary
    quadratic: no broadcast, no all-pairs, both sides arbitrary size.

    Completeness: if Levenshtein(a, b) ≤ 1 the two deletion
    neighborhoods {s} ∪ del1(s) intersect (equal → s itself; one
    insertion → the shorter string; one substitution → deleting the
    differing position from each). Sharing a variant only bounds the
    distance by 2, so candidates are verified with the exact DP before
    emission — variant hashing buys recall, verification buys precision.

    Physical plan: per-block distinct values explode to
    ``(md5-LE64(variant), value)`` — ~(len+1) int64 keys per distinct
    string, never row payloads; ONE variant-hash exchange + vectorized
    per-partition merge emits candidates; a second tiny pair-hash
    exchange dedups (a pair can share several variants across
    partitions) and runs the ≤ 1 verify once per distinct pair. Output
    ``(left_col, right_col, dist)`` over DISTINCT value pairs — join
    back to row ids with a plain hash_join on the value."""
    import zlib

    import pandas as pd

    from documentai_ray.stages.sketches import md5_le64

    if left_col == right_col:
        raise ValueError("left_col and right_col must differ (rename upstream)")

    def explode(col: str, side: str):
        def f(batch: pa.Table) -> pa.Table:
            vals = set(batch.column(col).to_pylist())
            out_h, out_v = [], []
            for v in vals:
                if v is None:
                    continue
                for var in deletion_variants(v):
                    h = md5_le64(var)
                    out_h.append(h - (1 << 64) if h >= (1 << 63) else h)
                    out_v.append(v)
            pk = [h % num_partitions for h in out_h]
            return pa.table({"vh": pa.array(out_h, pa.int64()),
                             "val": pa.array(out_v, pa.string()),
                             "side": pa.array([side] * len(out_v)),
                             "_pkey": pa.array(pk, pa.int32())})
        return f

    tagged = (left_ds.map_batches(explode(left_col, "l"),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(explode(right_col, "r"),
                                          batch_format="pyarrow")))

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["side"] == "l"][["vh", "val"]].drop_duplicates()
        rg = g[g["side"] == "r"][["vh", "val"]].drop_duplicates()
        m = lg.merge(rg, on="vh", suffixes=("_l", "_r"))
        return m[["val_l", "val_r"]].drop_duplicates()

    cand = (tagged.groupby("_pkey")
            .map_groups(lambda g: candidates(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))

    def pair_key(batch: pa.Table) -> pa.Table:
        from documentai_ray.stages._hashutil import hash_pkey

        pk = hash_pkey([batch.column("val_l"), batch.column("val_r")],
                       num_partitions)
        return batch.append_column("_ppk", pa.array(pk, pa.int32()))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["val_l", "val_r"])
        dist = [levenshtein(a, b)
                for a, b in zip(g["val_l"], g["val_r"])]
        g = g.assign(dist=np.asarray(dist, np.int64))
        g = g[g["dist"] <= 1]
        return g.rename(columns={"val_l": left_col, "val_r": right_col})

    return (cand.map_batches(pair_key, batch_format="pyarrow")
            .groupby("_ppk")
            .map_groups(lambda g: verify(g.drop(columns=["_ppk"])),
                        batch_format="pandas"))


# American Soundex letter classes (simplified: no h/w separator rule —
# the variant every SQL dialect implements); A=0 ... Z=2, vowels/h/w 0
_SOUNDEX_MAP = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                             "01230120022455012623010202")
_NON_ALPHA = re.compile(r"[^A-Z]")
_RUNS = re.compile(r"(.)\1+")


def soundex(name: str) -> str:
    """Simplified American Soundex: letter + 3 digits. Uppercase,
    strip non-alpha, map letters to class digits, collapse adjacent
    equal digits (so a second letter sharing the first letter's class
    merges into its run and is skipped — PFISTER → P236), drop the
    first run's digit, drop zeros, pad/truncate to 3. Empty input →
    ''. Deliberately omits the full standard's h/w-separator rule so
    the SQL mirror is seven chained fixed-pattern regexp_replace calls
    (RE2 has no backreferences) with bit-identical output."""
    up = _NON_ALPHA.sub("", name.upper())
    if not up:
        return ""
    digits = up.translate(_SOUNDEX_MAP)
    collapsed = _RUNS.sub(r"\1", digits)
    tail = collapsed[1:].replace("0", "")
    return up[0] + (tail + "000")[:3]


def soundex_blocking(ds, *, col: str):
    """Phonetic blocking census — group distinct strings by their
    Soundex code and count collisions: the classic cheap blocking key
    for name-matching record linkage (symspell_join catches typos at
    edit distance; Soundex catches SMITH/SMYTH-style sound-alike
    variants edit distance misses, and this census sizes the candidate
    blocks before anyone runs the quadratic comparisons). Per-batch
    distinct (code, name) partials → one (code, name) exchange →
    a tiny per-code fold. Returns (code, n_names, n_rows) — distinct
    strings sharing the code, and total rows carrying them."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        names = batch.column(col).to_pylist()
        df = pd.DataFrame({"name": names})
        df["code"] = [soundex(n or "") for n in names]
        g = (df.groupby(["code", "name"], as_index=False)
             .size().rename(columns={"size": "_n"}))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    per_name = (ds.select_columns([col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby(["code", "name"])
                .aggregate(Sum("_n", alias_name="_n")))
    return (per_name.groupby("code")
            .aggregate(Count(alias_name="n_names"),
                       Sum("_n", alias_name="n_rows")))
