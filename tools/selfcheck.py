"""Driver-style correctness self-check: run every queries() entry and its
oracle_sql() side-by-side at a given sf and compare row-count + schema +
order-insensitive values (columns sorted by name, rows sorted by all
columns). Mirrors what the driver records into CORRECTNESS_r{N}.json.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result.reset_index(drop=True)
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint64",):
            df[c] = df[c].astype("float64") if df[c].max() > 2**63 - 1 else df[c].astype("int64")
        if str(df[c].dtype).startswith(("int", "Int")):
            df[c] = df[c].astype("int64")
        if df[c].dtype == bool or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _kind(dtype) -> str:
    """Coarse dtype class matching the driver's hash canonicalization: it
    distinguishes int from float (a DuckDB HUGEINT lands in pandas as
    float64 and hash-mismatches an int64 Ray column even when values are
    numerically equal), so selfcheck must too."""
    s = str(dtype)
    if s.startswith("datetime64"):
        return "datetime"
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b" or s == "boolean":
        return "bool"
    return "object"


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(ray_df) != len(sql_df):
        issues.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    if len(ray_df) == 0 and len(sql_df) == 0 and not len(ray_df.columns):
        # Ray 2.49 artifact: an all-empty Dataset loses its column schema
        # at the to_pandas() boundary (even typed-empty from_arrow input,
        # see stages/joins.py note). Both sides empty -> nothing to
        # diverge; the driver never hits this case at its sf0.01 scale.
        return issues
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        issues.append(f"columns ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return issues
    if issues:
        return issues
    # dtype-strict gate BEFORE canon() coercion: int-vs-float (and any other
    # dtype-class) mismatch fails even if values compare numerically equal.
    for c in sorted(ray_df.columns):
        rk, sk = _kind(ray_df[c].dtype), _kind(sql_df[c].dtype)
        if rk != sk:
            issues.append(
                f"dtype col {c}: ray={ray_df[c].dtype}({rk}) sql={sql_df[c].dtype}({sk})")
    if issues:
        return issues
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = np.array_equal(av.astype(np.float64), bv.astype(np.float64), equal_nan=True)
        else:
            eq = (av == bv).all() if len(av) else True
        if not eq:
            bad = np.nonzero(~(av == bv))[0][:3] if av.dtype.kind != "f" else \
                np.nonzero(av.astype(np.float64) != bv.astype(np.float64))[0][:3]
            for i in bad:
                issues.append(f"col {c} row {i}: ray={av[i]!r} sql={bv[i]!r}")
    return issues


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"[FAIL] {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows in {dt:.1f}s")
            n_pass += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"[FAIL] {name}: oracle raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        issues = compare(name, ray_df, sql_df)
        if issues:
            print(f"[FAIL] {name} ({dt:.1f}s): " + "; ".join(issues[:5]))
            n_fail += 1
        else:
            print(f"[pass] {name}: {len(ray_df)} rows in {dt:.1f}s")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
