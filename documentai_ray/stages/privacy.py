"""Structured-data privacy: k-anonymity suppression.

Text-level PII handling lives in curation.py (pattern redaction,
deterministic pseudonymization). This module covers the STRUCTURED
side: before metadata tables (user attributes, document provenance)
ship with a training corpus, quasi-identifier combinations that
single out fewer than k individuals must not survive — the classic
re-identification vector is not any one column but the join of
harmless-looking ones (Sweeney's zip/birthdate/sex result; public
knowledge).

``k_anonymize`` enforces k-anonymity by SUPPRESSION: every row whose
quasi-identifier (QI) equivalence class has fewer than ``k`` members
gets its QI values replaced with ``'*'`` (the class collapses into the
suppressed pool); rows in classes of size ≥ k pass through unchanged.

Physical plan — ONE row exchange, no join:
rows hash-partition by crc32 of the QI tuple, so every equivalence
class lands WHOLE in exactly one partition; the partition computes all
its class sizes in a single vectorized groupby-transform and applies
the suppression mask columnarly. The exchange carries only the QI
columns plus whatever the caller kept (project upstream). Skew note:
the suppressed classes are by definition small; a HOT class (huge n)
lands whole in one partition but needs only a size count there — no
pairwise work — so skew costs one partition's linear scan.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa


def k_anonymize(ds, *, qi_cols: list[str], k: int,
                num_partitions: int = 64, suppressed: str = "*"):
    """Return ``ds`` with each QI column ``c`` replaced by a string
    column ``{c}_qi`` (value stringified, or ``suppressed`` when the
    row's QI class has < k members) plus a ``k_anonymous`` bool column.
    Non-QI columns pass through unchanged."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def add_pkey(batch: pa.Table) -> pa.Table:
        cols = [batch.column(c).to_pylist() for c in qi_cols]
        pk = np.fromiter(
            (zlib.crc32("\x1f".join(str(v) for v in row).encode())
             % num_partitions for row in zip(*cols)),
            dtype=np.int32, count=batch.num_rows)
        return batch.append_column("_pkey", pa.array(pk, pa.int32()))

    def suppress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_pkey"])
        sizes = g.groupby(qi_cols, sort=False, dropna=False)[qi_cols[0]] \
                 .transform("size")
        ok = sizes.to_numpy() >= k
        out = g.copy()
        for c in qi_cols:
            vals = g[c].astype(str).to_numpy(dtype=object)
            vals[~ok] = suppressed
            out[f"{c}_qi"] = vals
        out = out.drop(columns=qi_cols)
        out["k_anonymous"] = ok
        return out

    return (ds.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("_pkey")
            .map_groups(suppress, batch_format="pandas"))


def k_anonymity_audit(ds, *, qi_cols: list[str], k: int):
    """Audit only — per-equivalence-class sizes without moving rows:
    per-batch pre-combined (QI..., c) count partials, one exchange
    bounded by the number of DISTINCT QI combinations. Returns
    (qi_cols..., class_size, k_anonymous)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(qi_cols).to_pandas()
        g = (df.groupby(qi_cols, sort=False, dropna=False)
             .size().reset_index(name="c"))
        return pa.Table.from_pandas(g, preserve_index=False)

    sizes = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(qi_cols).aggregate(Sum("c", alias_name="class_size")))

    def flag(batch: pa.Table) -> pa.Table:
        n = batch.column("class_size").to_numpy()
        return batch.append_column(
            "k_anonymous", pa.array((n >= k).tolist(), pa.bool_()))

    return sizes.map_batches(flag, batch_format="pyarrow")

def l_diversify(ds, *, qi_cols: list[str], sensitive_col: str, l: int,
                num_partitions: int = 64, suppressed: str = "*"):
    """l-diversity suppression — k-anonymity's stricter sibling: a QI
    class where every member shares the SAME sensitive value leaks that
    value even when the class is large (homogeneity attack;
    Machanavajjhala et al. 2006, public knowledge). Rows whose QI class
    carries fewer than ``l`` DISTINCT sensitive values get their QI
    columns suppressed to ``'*'``; diverse classes pass through.

    Same physical plan as ``k_anonymize`` — ONE row exchange keyed by
    crc32 of the QI tuple co-locates each class whole, then the
    partition computes per-class ``nunique(sensitive)`` in one
    vectorized groupby-transform (a hot class costs one linear scan,
    never pairwise work). Emits ``{c}_qi`` string columns plus an
    ``l_diverse`` bool; non-QI columns (including the sensitive one)
    pass through unchanged."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")

    def add_pkey(batch: pa.Table) -> pa.Table:
        cols = [batch.column(c).to_pylist() for c in qi_cols]
        pk = np.fromiter(
            (zlib.crc32("\x1f".join(str(v) for v in row).encode())
             % num_partitions for row in zip(*cols)),
            dtype=np.int32, count=batch.num_rows)
        return batch.append_column("_pkey", pa.array(pk, pa.int32()))

    def suppress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_pkey"])
        ldiv = g.groupby(qi_cols, sort=False, dropna=False)[sensitive_col] \
                .transform("nunique")
        ok = ldiv.to_numpy() >= l
        out = g.copy()
        for c in qi_cols:
            vals = g[c].astype(str).to_numpy(dtype=object)
            vals[~ok] = suppressed
            out[f"{c}_qi"] = vals
        out = out.drop(columns=qi_cols)
        out["l_diverse"] = ok
        return out

    return (ds.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("_pkey")
            .map_groups(suppress, batch_format="pandas"))


def l_diversity_audit(ds, *, qi_cols: list[str], sensitive_col: str,
                      l: int):
    """Audit only — per-QI-class size AND distinct-sensitive-value
    count without moving rows: ONE exchange of per-batch (QI...,
    sensitive, c) count partials bounded by distinct (QI, sensitive)
    combinations, folded per class into ``(class_size, l_distinct,
    l_diverse)`` — class_size is the sum of counts, l_distinct the
    number of surviving (QI, sensitive) rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(qi_cols + [sensitive_col]).to_pandas()
        g = (df.groupby(qi_cols + [sensitive_col], sort=False,
                        dropna=False).size().reset_index(name="c"))
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    per_sv = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(qi_cols + [sensitive_col])
              .aggregate(Sum("c", alias_name="c")))

    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (df.groupby(qi_cols, sort=False, dropna=False)
             .agg(class_size=("c", "sum"), l_distinct=("c", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    # second tiny exchange bounded by distinct QI combos: the per_sv
    # table already fits the aggregate contract, but distinct sensitive
    # values of one class may span blocks — re-key by QI before folding.
    from ray.data.aggregate import Sum as _Sum
    folded = (per_sv.map_batches(fold, batch_format="pyarrow")
              .groupby(qi_cols)
              .aggregate(_Sum("class_size", alias_name="class_size"),
                         _Sum("l_distinct", alias_name="l_distinct")))

    def flag(batch: pa.Table) -> pa.Table:
        n = batch.column("l_distinct").to_numpy()
        return batch.append_column(
            "l_diverse", pa.array((n >= l).tolist(), pa.bool_()))

    return folded.map_batches(flag, batch_format="pyarrow")


def t_closeness_audit(ds, *, qi_cols: list[str], sensitive_col: str,
                      t_ppm: int, num_partitions: int = 32):
    """t-closeness audit — the DISTRIBUTION-level member of the privacy
    trio (Li et al. 2007, public knowledge): k-anonymity bounds class
    SIZE, l-diversity bounds distinct sensitive VALUES, but a class can
    pass both while its sensitive distribution still leaks (99%
    in-arrears in a class vs 9% globally tells an attacker plenty).
    t-closeness requires each QI class's sensitive distribution to sit
    within total-variation distance t of the GLOBAL distribution.

    TVD is rational, so the audit is exact integer ppm: with class
    histogram c_v (size m), global histogram g_v (size N),
    TVD = Σ_v |c_v·N − g_v·m| / (2·m·N) — and values ABSENT from the
    class contribute exactly g_v·m, so the observed (QI, sensitive)
    histogram plus the tiny global histogram suffice (the seasonality
    free-lunch: no dense grid materialized):
    Σ_v |…| = Σ_{v∈class} |c_v·N − g_v·m| + (N − Σ_{v∈class} g_v)·m.

    Physical plan: ONE exchange of per-batch (QI…, sensitive, c) count
    partials bounded by distinct (QI, sensitive) combos; the global
    histogram folds from that same table (driver-side, ≤ |values|
    rows); a second QI-hash exchange co-locates each class's histogram
    rows and ALL classes in a partition fold in one vectorized pandas
    pass.  Returns (qi…, class_size, tvd_ppm, t_close) — floor ≡ trunc
    (every term ≥ 0)."""
    import zlib

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(qi_cols + [sensitive_col]).to_pandas()
        g = (df.groupby(qi_cols + [sensitive_col], sort=False,
                        dropna=False).size().reset_index(name="c"))
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    per_sv = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(qi_cols + [sensitive_col])
              .aggregate(Sum("c", alias_name="c")))

    glob = (per_sv.groupby(sensitive_col)
            .aggregate(Sum("c", alias_name="gv"))).to_pandas()
    gmap = dict(zip(glob[sensitive_col], glob["gv"].astype("int64")))
    n_total = int(glob["gv"].sum())

    def add_pkey(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        key = df[qi_cols].astype(str).agg("|".join, axis=1)
        pk = key.map(lambda s: zlib.crc32(s.encode()) % num_partitions)
        return pa.Table.from_pandas(
            df.assign(_pkey=pk.astype("int32")),
            preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["gv"] = g[sensitive_col].map(gmap).astype("int64")
        grp = g.groupby(qi_cols, sort=False, dropna=False)
        m = grp["c"].transform("sum").astype("int64")
        term = (g["c"].astype("int64") * n_total - g["gv"] * m).abs()
        agg = pd.DataFrame({
            "_t1": term, "_gv": g["gv"], "_m": m})
        for c in qi_cols:
            agg[c] = g[c]
        out = (agg.groupby(qi_cols, sort=False, dropna=False)
               .agg(_t1=("_t1", "sum"), _gvs=("_gv", "sum"),
                    class_size=("_m", "first")).reset_index())
        s = out["_t1"] + (n_total - out["_gvs"]) * out["class_size"]
        out["tvd_ppm"] = (1_000_000 * s
                          // (2 * out["class_size"] * n_total))
        out["t_close"] = out["tvd_ppm"] <= t_ppm
        out["class_size"] = out["class_size"].astype("int64")
        out["tvd_ppm"] = out["tvd_ppm"].astype("int64")
        return out[qi_cols + ["class_size", "tvd_ppm", "t_close"]]

    return (per_sv.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("_pkey")
            .map_groups(lambda g: fold(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))
