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
