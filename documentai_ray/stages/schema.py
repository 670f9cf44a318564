"""Schema-evolution utilities — the data-lake reality that yesterday's
shards lack today's columns.

``union_by_name`` is the read-side half of schema evolution: older
snapshots missing newly-added columns union cleanly with newer ones,
null-filled, matching lake-engine ``UNION ALL BY NAME`` semantics. Name
collisions with CONFLICTING types fail loudly — silent casts corrupt;
widening is an upstream decision.
"""

from __future__ import annotations

import pyarrow as pa


def union_by_name(datasets: list):
    """Union Datasets by COLUMN NAME: the output schema is the ordered
    union of all input schemas (first-seen order), each input is
    projected onto it with missing columns null-filled, then a plain
    (zero-copy, streaming) ``union`` concatenates the blocks. A column
    appearing with two different types raises — no silent coercion."""
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    all_cols: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = ds.schema()
        for name, typ in zip(sch.names, sch.types):
            if name in all_cols and all_cols[name] != typ:
                raise ValueError(
                    f"column {name!r} has conflicting types "
                    f"{all_cols[name]} vs {typ} (resolve upstream)")
            all_cols.setdefault(name, typ)

    def project(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in all_cols.items():
            if name in batch.column_names:
                cols[name] = batch.column(name)
            else:
                cols[name] = pa.nulls(batch.num_rows, typ)
        return pa.table(cols)

    out = None
    for ds in datasets:
        p = ds.map_batches(project, batch_format="pyarrow")
        out = p if out is None else out.union(p)
    return out


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """Wide → long reshaping (pandas ``melt`` / SQL ``UNPIVOT``): each
    input row becomes ``len(value_cols)`` output rows
    ``(id_cols..., variable, value)``. The write-side half of schema
    reshaping beside ``union_by_name``'s read-side half — the step that
    turns a metrics-wide table into the tall layout groupbys and
    windowed ops want.

    Pure per-batch Arrow transform, ZERO exchange and zero copies of
    the id columns beyond the one concat: per measure column the batch
    is projected to (ids..., literal variable, renamed value) and the k
    projections concatenate — output row order is the deterministic
    per-measure-then-row order, k·n rows per n-row batch. All value
    columns must share one type (cast upstream; no silent coercion,
    same contract as union_by_name)."""
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")

    def melt(batch: pa.Table) -> pa.Table:
        vtypes = {str(batch.column(c).type) for c in value_cols}
        if len(vtypes) > 1:
            raise ValueError(
                f"value columns have conflicting types {sorted(vtypes)}; "
                "cast upstream")
        n = batch.num_rows
        pieces = []
        for c in value_cols:
            cols = {ic: batch.column(ic) for ic in id_cols}
            cols[var_name] = pa.array([c] * n, pa.string())
            cols[value_name] = batch.column(c)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow")


def posexplode_tokens(ds, *, id_cols: list[str], text_col: str,
                      pos_col: str = "pos", token_col: str = "token"):
    """Positional explode of a whitespace-tokenized text column: each
    row becomes one ``(id_cols..., pos, token)`` row per token, pos
    1-based in document order — the third reshaping surface beside
    ``unpivot`` (columns → rows) and ``union_by_name`` (schemas), and
    the layout positional n-gram / co-occurrence / index builds start
    from. Tokenization is the repo-standard whitespace rule
    (``\\s+`` split, empties dropped — the exact semantics the
    quality/token-stats oracles already mirror).

    Pure per-batch transform, ZERO exchange: pandas ``str.split`` +
    ``explode`` (C paths) with a vectorized groupby-cumcount for the
    positions; rows with empty/NULL text emit nothing."""

    def melt(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        df = batch.select(id_cols + [text_col]).to_pandas()
        df["_toks"] = df[text_col].fillna("").str.split()
        df = df.drop(columns=[text_col])
        out = df.explode("_toks", ignore_index=True)
        out = out[out["_toks"].notna()].reset_index(drop=True)
        # positions, fully vectorized: global arange minus each row's
        # start offset, +1 for 1-based (explode preserves source order)
        n_per = df["_toks"].str.len().fillna(0).astype(np.int64).to_numpy()
        total = int(n_per.sum())
        starts = np.repeat(np.concatenate([[0], n_per.cumsum()[:-1]]),
                           n_per)
        out[pos_col] = (np.arange(total, dtype=np.int64) - starts + 1)
        out = out.rename(columns={"_toks": token_col})
        return pa.Table.from_pandas(out[id_cols + [pos_col, token_col]],
                                    preserve_index=False) \
                       .replace_schema_metadata(None)

    return ds.map_batches(melt, batch_format="pyarrow")


def delta_varint_size(ds, *, val_col: str):
    """Storage-layout advisor: exact byte cost of the column under
    sorted delta + LEB128-varint encoding vs raw int64 — the question
    a table-layout tool answers before choosing a sort key ("dates
    sorted delta-encode to ~1 byte/row; the same column unsorted costs
    8"). Encoding model: first value 8 bytes, then each row stores
    varint(v − prev) over the SORTED order, duplicates costing the
    1-byte zero delta; varint length = (bit_length(d) + 6) // 7.

    Physical plan: ONE (value, count) histogram exchange bounded by
    distinct values (the grouped_median_int contract — the degenerate
    all-distinct case makes the histogram row-sized; bucket first for
    near-unique columns), then a driver scan over the distinct axis:
    each distinct value pays one real delta, its duplicates pay 1 byte
    each — no per-row work anywhere. Returns one row
    (n, raw_bytes, delta_bytes, ratio_ppm)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([val_col]).to_pandas()
        g = (df.groupby(val_col, as_index=False).size()
             .rename(columns={"size": "_n", val_col: "_v"}))
        g["_v"] = g["_v"].astype("int64")
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_v")
            .aggregate(Sum("_n", alias_name="_n"))).to_pandas()
    if hist.empty:
        raise ValueError("delta_varint_size: empty input")
    hist = hist.sort_values("_v", kind="mergesort")
    vs = hist["_v"].to_numpy()
    cs = hist["_n"].to_numpy()
    n = int(cs.sum())
    bytes_total = 8 + int(cs[0]) - 1          # first value + its dups
    prev = int(vs[0])
    for v, c in zip(vs[1:].tolist(), cs[1:].tolist()):
        d = v - prev
        bytes_total += (d.bit_length() + 6) // 7 + (int(c) - 1)
        prev = v
    raw = n * 8
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "raw_bytes": pa.array([raw], pa.int64()),
        "delta_bytes": pa.array([bytes_total], pa.int64()),
        "ratio_ppm": pa.array([bytes_total * 1_000_000 // raw],
                              pa.int64())})


def nest_list(ds, *, key_cols: list[str], order_cols: list[str],
              val_col: str, out_col: str = "items",
              num_partitions: int = 32):
    """Collect-list re-nesting — the INVERSE of ``posexplode_tokens``
    and the fourth reshaping surface (explode: rows→more rows, unpivot:
    cols→rows, union_by_name: schemas; this: rows→nested column): all
    of a key's values gathered into ONE ``list`` cell in ``order_cols``
    order — the layout per-document models want after token- or
    chunk-level stages ran row-wise (SQL ``list(v ORDER BY ...)``).

    ONE row exchange co-locates each key (projection only), then each
    partition nests ALL its keys in one vectorized pandas
    sort + groupby-agg(list) pass — never one map_groups call per key.
    Order inside the list is total (include a unique tiebreak in
    ``order_cols``), so the result is parallelism-independent."""
    import pandas as pd

    from documentai_ray.stages.dedup import _add_pkey

    def nest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + order_cols, kind="mergesort")
        out = (g.groupby(key_cols, sort=False)[val_col]
               .agg(list).reset_index(name=out_col))
        return out

    keyed = _add_pkey(ds.select_columns(key_cols + order_cols
                                        + [val_col]),
                      key_cols[0], num_partitions)
    return (keyed.groupby("_pkey")
            .map_groups(lambda g: nest(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))
