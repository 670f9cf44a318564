"""Join operators (SURVEY §2.5 — the reference has no relational joins; this
is the engine-capability surface a user of a data engine expects).

- ``broadcast_join`` — small side shipped once via ``ray.put``, looked up
  per batch inside ``map_batches``: zero shuffle of the fact table. The
  right pattern whenever one side fits in worker memory.
- ``hash_join`` — both sides large: explicit partitioned hash join. Each
  side gets ``pkey = crc32(key) % P``; the tagged union is grouped by pkey
  and each partition does one vectorized ``pandas.merge``. This is the
  portable bucket-join idiom (matching keys co-locate by construction).
  Skew note: a hot key lands whole in one partition — salt hot keys into
  sub-buckets and replicate the other side when profiling shows a heavy
  hitter (same salting machinery as state/partitioning.py).
- ``asof_join`` — per-key ordered as-of join via ``merge_asof`` inside
  bucket partitions (both sides sorted within the partition).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(fact_ds, dim_df: pd.DataFrame, *, fact_key: str,
                   dim_key: str, columns: list[str] | None = None):
    """Left join fact→dim; dim must be driver-small. Returns fact columns +
    requested dim columns (all dim columns by default)."""
    import ray

    cols = columns or [c for c in dim_df.columns if c != dim_key]
    lookup_ref = ray.put(dim_df.set_index(dim_key)[cols])

    def attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = batch.column(fact_key).to_pylist()
        sub = lk.reindex(keys)
        out = batch
        for c in cols:
            out = out.append_column(c, pa.Array.from_pandas(sub[c].reset_index(drop=True)))
        return out

    return fact_ds.map_batches(attach, batch_format="pyarrow")


def _tag_and_key(ds, key: str, side: str, all_cols: dict[str, pa.DataType],
                 num_partitions: int):
    """Project a side onto the union schema (missing cols null), add the
    side tag and the bucket pkey."""

    def f(batch: pa.Table) -> pa.Table:
        from documentai_ray.stages._hashutil import hash_pkey

        n = batch.num_rows
        cols: dict[str, pa.Array] = {}
        for name, typ in all_cols.items():
            if name in batch.column_names:
                cols[name] = batch.column(name).cast(typ)
            else:
                cols[name] = pa.nulls(n, typ)
        # hash the POST-cast key column so both sides of the join hash
        # the identical dtype (see _hashutil contract)
        pk = hash_pkey([cols[key]], num_partitions)
        cols["_side"] = pa.array([side] * n, pa.string())
        cols["_pkey"] = pa.array(pk, pa.int32())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


_NULLABLE_INT_DTYPES = {
    pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
}


def _group_df(g: pa.Table) -> pd.DataFrame:
    """Arrow group → pandas WITHOUT int→float degradation.

    The tagged union feeding a join partition null-fills each side's
    missing columns, and a default ``to_pandas`` turns int64-with-nulls
    into float64 — silently corrupting values above 2^53 (e.g. 64-bit
    hash keys) before the final cast back to int64. Mapping integer
    columns to pandas' nullable Int/UInt extension dtypes keeps them
    exact end-to-end."""
    return g.to_pandas(types_mapper=_NULLABLE_INT_DTYPES.get)


# NOTE on empty results: a Ray 2.49 Dataset whose every block is empty
# loses its column schema at the to_pandas() boundary — even a typed
# ray.data.from_arrow(schema.empty_table()) comes back as a zero-column
# DataFrame, and unioning a typed empty seed block does not survive
# schema unification either (verified empirically). Joins that produce
# zero rows at tiny scales therefore surface column-less frames to a
# driver-style comparison; the comparison harness treats
# both-sides-empty as a pass, since no value or schema information
# exists to diverge.


def hash_join(left_ds, right_ds, *, on: str, num_partitions: int = 64,
              how: str = "inner"):
    """Partitioned hash join of two Datasets on a common key column ``on``.

    ``how``: ``inner`` / ``left`` (right columns null-filled) /
    ``outer`` (full outer — unmatched rows of EITHER side survive with the
    other side's columns null) /
    ``semi`` (left rows WITH a match, left columns only) /
    ``anti`` (left rows WITHOUT a match, left columns only). All variants
    share the same bucketed physical plan — matching keys co-locate, so
    existence tests are a per-partition vectorized ``isin``.

    Column-name collisions (other than the key) must be resolved upstream
    (rename before joining) — the join output carries the union of columns.
    """
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    all_cols: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        all_cols[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        if name in all_cols and name != on:
            raise ValueError(f"column collision: {name!r} (rename before join)")
        all_cols.setdefault(name, typ)
    lcols = [n for n in lschema.names]
    rcols = [n for n in rschema.names if n != on]

    tagged = _tag_and_key(left_ds, on, "l", all_cols, num_partitions).union(
        _tag_and_key(right_ds, on, "r", all_cols, num_partitions)
    )

    def join_partition(gt: pa.Table) -> pa.Table:
        g = _group_df(gt)
        lg = g[g["_side"] == "l"][lcols]
        rg = g[g["_side"] == "r"][rcols + [on]]
        if how in ("semi", "anti"):
            mask = lg[on].isin(rg[on].unique())
            out = lg[mask] if how == "semi" else lg[~mask]
        else:
            out = lg.merge(rg, on=on, how=how)
        # emit Arrow with the EXPLICIT union schema: empty partitions must
        # not degrade to pandas-inferred null-typed columns
        schema = pa.schema([(c, all_cols[c]) for c in out.columns])
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("_pkey").map_groups(join_partition, batch_format="pyarrow")


def salted_join(left_ds, right_ds, *, on: str, heavy_keys: dict,
                num_partitions: int = 64, how: str = "inner"):
    """Skew-aware partitioned hash join — the hot-key plan ``hash_join``'s
    docstring prescribes, made concrete. ``heavy_keys`` maps each detected
    hot key to its salt factor ``k`` (``state.partitioning.
    detect_heavy_hosts`` is the matching detection pre-pass).

    Physical plan: fact (left) rows carrying a hot key get a cycling
    per-row salt in ``[0, k)``; the build (right) side REPLICATES each hot
    row once per salt, so every ``(key, salt)`` sub-bucket holds the
    complete build rows for its key and each fact row still joins exactly
    once. Non-heavy keys use salt 0 on both sides. The output is
    row-for-row identical to ``hash_join(how=...)`` — only partition
    ROUTING changes: a key carrying a third of the exchange spreads over
    ``k`` reducers instead of landing whole in one. Replication cost is
    ``k × |heavy build rows|`` — the heavy set is a handful of keys by
    construction, so the build side grows by O(k·|heavy|), not O(k·n).

    Salt assignment is per-batch cycling (parallelism-dependent), but
    salts only route rows — the join output is salt-invariant.

    ``how``: ``inner`` / ``left`` / ``semi`` / ``anti`` (hash_join's
    contracts; semi/anti are correct because every salt sub-bucket sees
    the full build-row set for its key).
    """
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    all_cols: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        all_cols[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        if name in all_cols and name != on:
            raise ValueError(f"column collision: {name!r} (rename before join)")
        all_cols.setdefault(name, typ)
    lcols = list(lschema.names)
    rcols = [n for n in rschema.names if n != on]
    heavy = {k: max(int(v), 1) for k, v in heavy_keys.items()}

    def _pk(key, salt: int) -> int:
        return zlib.crc32(f"{key}\x1f{salt}".encode()) % num_partitions

    def _project(batch: pa.Table, side: str) -> dict:
        n = batch.num_rows
        cols: dict[str, pa.Array] = {}
        for name, typ in all_cols.items():
            if name in batch.column_names:
                cols[name] = batch.column(name).cast(typ)
            else:
                cols[name] = pa.nulls(n, typ)
        cols["_side"] = pa.array([side] * n, pa.string())
        return cols

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = _project(batch, "l")
        keys = batch.column(on).to_pylist()
        pk = np.empty(len(keys), np.int32)
        ctr: dict = {}
        for i, kv in enumerate(keys):
            kfac = heavy.get(kv)
            if kfac:
                s = ctr.get(kv, 0)
                ctr[kv] = (s + 1) % kfac
            else:
                s = 0
            pk[i] = _pk(kv, s)
        cols["_pkey"] = pa.array(pk, pa.int32())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = _project(batch, "r")
        keys = batch.column(on).to_pylist()
        take_idx: list[int] = []
        pks: list[int] = []
        for i, kv in enumerate(keys):
            for s in range(heavy.get(kv, 1)):
                take_idx.append(i)
                pks.append(_pk(kv, s))
        t = pa.table(cols).take(pa.array(take_idx, pa.int64()))
        return t.append_column("_pkey", pa.array(pks, pa.int32()))

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def join_partition(gt: pa.Table) -> pa.Table:
        g = _group_df(gt)
        lg = g[g["_side"] == "l"][lcols]
        rg = g[g["_side"] == "r"][rcols + [on]]
        if how in ("semi", "anti"):
            mask = lg[on].isin(rg[on].unique())
            out = lg[mask] if how == "semi" else lg[~mask]
        else:
            out = lg.merge(rg, on=on, how=how)
        schema = pa.schema([(c, all_cols[c]) for c in out.columns])
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("_pkey").map_groups(join_partition, batch_format="pyarrow")


def asof_join(left_ds, right_ds, *, on: str, by: str, num_partitions: int = 32,
              direction: str = "backward"):
    """As-of join (nearest earlier right row per left row) per ``by`` key,
    ordered by ``on`` — ``pd.merge_asof`` inside bucket partitions."""
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    all_cols: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        all_cols[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        if name not in (on, by) and name in all_cols:
            raise ValueError(f"column collision: {name!r}")
        all_cols.setdefault(name, typ)
    lcols = list(lschema.names)
    rcols = [n for n in rschema.names]

    tagged = _tag_and_key(left_ds, by, "l", all_cols, num_partitions).union(
        _tag_and_key(right_ds, by, "r", all_cols, num_partitions)
    )

    def join_partition(gt: pa.Table) -> pa.Table:
        g = _group_df(gt)
        lg = g[g["_side"] == "l"][lcols].sort_values(on, kind="mergesort")
        rg = g[g["_side"] == "r"][rcols].sort_values(on, kind="mergesort")
        if lg.empty:
            out = lg
        else:
            out = pd.merge_asof(lg, rg, on=on, by=by, direction=direction)
        schema = pa.schema([(c, all_cols[c]) for c in out.columns])
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("_pkey").map_groups(join_partition, batch_format="pyarrow")


def interval_join(ds, intervals: pd.DataFrame, *, ts_col: str = "ts",
                  id_col: str = "interval_id", start_col: str = "start",
                  end_col: str = "end", carry_cols: list[str] | None = None):
    """Range join: match each row to EVERY interval containing its
    timestamp (``start <= ts < end``), intervals may overlap — the join
    type Ray Data lacks natively (VERDICT §custom-operators).

    Physical plan: the interval table is the broadcast-small side
    (calendars, rate windows, maintenance schedules — thousands of rows,
    not billions), shipped once via ``ray.put`` sorted by start. Per batch
    the candidate set for each ts is the start-index window
    ``(ts - max_len, ts]`` found with two vectorized ``searchsorted``
    calls — correct because no interval is longer than
    ``max_len = max(end - start)`` — then the exact ``end > ts`` check
    filters candidates. Cost is O(rows · max_overlap), never rows ×
    intervals. A fact-sized interval side would instead bucket both sides
    by coarse time epoch (the asof_join plan) — same output contract.
    """
    import ray

    iv = intervals.sort_values(start_col, kind="mergesort").reset_index(drop=True)
    carry = carry_cols or []
    max_len = (iv[end_col] - iv[start_col]).max()
    if hasattr(max_len, "to_timedelta64"):  # datetime intervals
        max_len = max_len.to_timedelta64()
    ref = ray.put({
        "starts": iv[start_col].to_numpy(),
        "ends": iv[end_col].to_numpy(),
        "ids": iv[id_col].to_numpy(),
        "carry": {c: iv[c].to_numpy() for c in carry},
        "max_len": max_len,
    })

    def match(batch: pa.Table) -> pa.Table:
        state = ray.get(ref)
        starts, ends = state["starts"], state["ends"]
        df = batch.to_pandas()
        ts = df[ts_col].to_numpy()
        hi = np.searchsorted(starts, ts, side="right")
        lo = np.searchsorted(starts, ts - state["max_len"], side="right")
        span = int((hi - lo).max()) if len(ts) else 0
        row_idx_parts, iv_idx_parts = [], []
        for j in range(span):
            cand = hi - 1 - j
            valid = cand >= lo
            rows = np.nonzero(valid)[0]
            cidx = cand[valid]
            inside = ends[cidx] > ts[rows]
            row_idx_parts.append(rows[inside])
            iv_idx_parts.append(cidx[inside])
        if row_idx_parts:
            rows = np.concatenate(row_idx_parts)
            ivs = np.concatenate(iv_idx_parts)
        else:
            rows = np.empty(0, np.int64)
            ivs = np.empty(0, np.int64)
        out = df.iloc[rows].reset_index(drop=True)
        out[id_col] = state["ids"][ivs]
        for c, vals in state["carry"].items():
            out[c] = vals[ivs]

        # explicit schema: empty match batches must not degrade to
        # pandas-inferred null columns (hash_join's same rule)
        def _atype(arr):
            return (pa.string() if arr.dtype == object
                    else pa.from_numpy_dtype(arr.dtype))

        schema = pa.schema(
            list(zip(batch.schema.names, batch.schema.types))
            + [(id_col, _atype(state["ids"]))]
            + [(c, _atype(v)) for c, v in state["carry"].items()])
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(match, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bloom-filter join prefilter
# ---------------------------------------------------------------------------

_BLOOM_A = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
            0x27D4EB2F165667C5)
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _bloom_positions(keys: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, n) bit positions from odd-multiplier mixes of int keys."""
    k = keys.astype(np.uint64)
    out = np.empty((n_hashes, len(k)), np.int64)
    for i in range(n_hashes):
        h = (k * np.uint64(_BLOOM_A[i])) & _U64
        h ^= h >> np.uint64(29)
        out[i] = (h % np.uint64(m_bits)).astype(np.int64)
    return out


def build_bloom(ds, *, key_col: str, m_bits: int = 1 << 20,
                n_hashes: int = 2) -> np.ndarray:
    """Distributed bloom build over a Dataset's key column: every batch
    emits its own packed bitmap (m_bits/8 bytes) and the driver ORs them —
    bitmap union is associative, so only sketch-sized state moves (the
    same contract as the KMV sketch). Size ``m_bits ≈ 10·n_keys`` for a
    ~1% false-positive rate at 2 hashes."""

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits, bool)
        pos = _bloom_positions(batch.column(key_col).to_numpy(), m_bits,
                               n_hashes)
        bits[pos.ravel()] = True
        return pa.table({"bm": pa.array([np.packbits(bits).tobytes()],
                                        pa.large_binary())})

    merged = np.zeros(m_bits // 8, np.uint8)
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        merged |= np.frombuffer(row["bm"], np.uint8)
    return np.unpackbits(merged).astype(bool)


def bloom_prefilter(ds, bloom: np.ndarray, *, key_col: str,
                    n_hashes: int = 2):
    """Drop rows whose key is definitely NOT in the bloom set before an
    exact join — the classic shuffle-volume reducer: the fact side
    shrinks to (matches + ~1% false positives) BEFORE the all-to-all
    exchange, and the exact hash_join downstream removes the false
    positives, so results are exact regardless of the filter's error
    rate. The bitmap ships once via ``ray.put`` (m_bits/8 bytes packed),
    never per batch."""
    import ray

    m_bits = len(bloom)
    ref = ray.put(np.packbits(bloom))

    def keep(batch: pa.Table) -> pa.Table:
        bits = np.unpackbits(ray.get(ref)).astype(bool)
        pos = _bloom_positions(batch.column(key_col).to_numpy(), m_bits,
                               n_hashes)
        mask = np.ones(batch.num_rows, bool)
        for i in range(pos.shape[0]):
            mask &= bits[pos[i]]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def merge_changelog(base_ds, changes_ds, *, key_col: str, ts_col: str = "ts",
                    op_col: str = "op", num_partitions: int = 64):
    """Apply a CDC changelog to a base snapshot — the lakehouse MERGE
    primitive (upserts + deletes): for every key keep the row with the
    HIGHEST ``ts`` across base ∪ changes (base rows carry their snapshot
    ts; ties break deterministically toward the change row), then drop
    keys whose winning op is a delete.

    Physical plan: one ``crc32(key) % P`` exchange co-locates each key's
    base row and its change history; per partition a single vectorized
    pass (sort by key, ts desc, op — 'D' < 'I' < 'U' reversed so deletes
    win ts ties; ``drop_duplicates`` first-per-key; filter op ≠ 'D')
    resolves every key at once. Schemas must match on the carried
    columns; ``op`` ∈ {'I','U','D'}."""
    from documentai_ray.stages.dedup import _add_pkey

    both = base_ds.union(changes_ds)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # op rank: deletes beat updates beat inserts at equal ts
        rank = g[op_col].map({"D": 2, "U": 1, "I": 0}).fillna(0)
        g = g.assign(_oprank=rank)
        g = g.sort_values([key_col, ts_col, "_oprank"],
                          ascending=[True, False, False], kind="mergesort")
        g = g.drop_duplicates(subset=[key_col], keep="first")
        return g[g[op_col] != "D"].drop(columns=["_oprank"])

    return (_add_pkey(both, key_col, num_partitions)
            .groupby("_pkey")
            .map_groups(lambda g: resolve(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))


def band_join(left_ds, right_ds, *, left_on: str, right_on: str,
              delta: int, num_partitions: int = 64,
              left_by: str | None = None, right_by: str | None = None):
    """Numeric tolerance (band / ε) join: every (l, r) pair with
    ``|l[left_on] − r[right_on]| ≤ delta`` — the non-equi join class
    (similar prices, close balances, timestamps within a margin) that a
    naive plan can only express as a cross join.

    Values and ``delta`` must be integers (convert money to cents
    upstream): the bucket arithmetic and the final compare then stay
    exact in any engine — no float boundary divergence at ±delta.

    Physical plan — bucket width = ``delta``, floor division (numpy and
    Python ``//`` both floor, so negatives bucket consistently):

    - left rows route to bucket ``v // delta`` ONCE;
    - right rows replicate to the 3 adjacent buckets
      ``v//delta − 1 … +1`` (distinct buckets, so a qualifying pair
      meets EXACTLY once — |l−r| ≤ delta pins ``l``'s bucket inside
      that neighborhood by floor monotonicity — and no pair-dedup
      exchange is needed);
    - ONE bucket-hash exchange co-locates candidates; each partition
      does a vectorized ``merge`` on the bucket id plus the exact
      ``|diff| ≤ delta`` filter.

    Shuffle volume is |L| + 3·|R| key-projected rows — put the smaller
    side on the RIGHT. Skew: a value-dense band lands in one partition;
    shrink the effective width by pre-splitting values upstream (salt on
    ``v // (delta/k)``) if profiling shows a hot band. Column names must
    not collide across sides (rename upstream).

    ``left_by``/``right_by`` (both or neither) add an EQUI key on top of
    the band — the windowed equi-join ("same user within ±delta
    seconds"): the routing hash and the in-partition merge both include
    the key, so only same-key rows ever pair and a hot time band splits
    across keys instead of landing whole in one partition."""
    if delta <= 0:
        raise ValueError("delta must be a positive integer")
    if (left_by is None) != (right_by is None):
        raise ValueError("pass both left_by and right_by, or neither")

    lschema, rschema = left_ds.schema(), right_ds.schema()
    all_cols: dict[str, pa.DataType] = dict(zip(lschema.names, lschema.types))
    for name, typ in zip(rschema.names, rschema.types):
        if name in all_cols:
            raise ValueError(f"column collision: {name!r} (rename before join)")
        all_cols[name] = typ
    lcols, rcols = list(lschema.names), list(rschema.names)

    def tag(side: str, on: str, by: str | None, shifts: tuple[int, ...]):
        def f(batch: pa.Table) -> pa.Table:
            v = batch.column(on).to_numpy().astype(np.int64)
            base = v // np.int64(delta)
            bys = (batch.column(by).to_pylist() if by is not None
                   else [""] * batch.num_rows)
            from documentai_ray.stages._hashutil import hash_pkey

            parts = []
            for sh in shifts:
                b = base + np.int64(sh)
                pk = hash_pkey([pa.array([str(y) for y in bys],
                                         pa.string()),
                                pa.array(b, pa.int64())], num_partitions)
                cols: dict[str, pa.Array] = {}
                for name, typ in all_cols.items():
                    if name in batch.column_names:
                        cols[name] = batch.column(name).cast(typ)
                    else:
                        cols[name] = pa.nulls(batch.num_rows, typ)
                cols["_side"] = pa.array([side] * batch.num_rows, pa.string())
                cols["_bucket"] = pa.array(b, pa.int64())
                cols["_bykey"] = pa.array([str(y) for y in bys], pa.string())
                cols["_pkey"] = pa.array(pk, pa.int32())
                parts.append(pa.table(cols))
            return pa.concat_tables(parts)
        return f

    tagged = (left_ds.map_batches(tag("l", left_on, left_by, (0,)),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(
                  tag("r", right_on, right_by, (-1, 0, 1)),
                  batch_format="pyarrow")))

    def join_partition(gt: pa.Table) -> pa.Table:
        g = _group_df(gt)
        lg = g[g["_side"] == "l"][lcols + ["_bucket", "_bykey"]]
        rg = g[g["_side"] == "r"][rcols + ["_bucket", "_bykey"]]
        m = (lg.merge(rg, on=["_bucket", "_bykey"])
             .drop(columns=["_bucket", "_bykey"]))
        keep = (m[left_on] - m[right_on]).abs() <= delta
        out = m[keep]
        schema = pa.schema([(c, all_cols[c]) for c in out.columns])
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("_pkey").map_groups(join_partition,
                                              batch_format="pyarrow")


def overlap_join(left_ds, right_ds, *, left_start: str, left_end: str,
                 right_start: str, right_end: str, tile: int,
                 num_partitions: int = 64):
    """Interval-overlap join (range × range): every (l, r) pair whose
    CLOSED intervals intersect — ``l.start ≤ r.end AND r.start ≤ l.end``
    — with NO equi-key. The genuinely-non-equi sibling of ``band_join``
    (which handles point-vs-point tolerance) and of ``interval_join``
    (point-in-broadcast-interval): here BOTH sides are interval sets and
    both are distributed.

    Endpoints must be integers (epoch days / seconds / cents upstream):
    tiling arithmetic and the overlap compare stay exact in any engine.

    Physical plan — fixed grid of width ``tile``:

    - each interval replicates to every tile it touches,
      ``start//tile … end//tile`` (floor division, negatives included);
    - overlapping intervals share the tile containing
      ``max(l.start, r.start)`` (that point lies in both intervals), and
      floor monotonicity makes that tile id exactly
      ``max(l.start//tile, r.start//tile)`` — so each pair is emitted
      ONLY from its owning tile: one guard predicate instead of a
      pair-dedup exchange;
    - ONE tile-hash exchange co-locates candidates; per partition a
      vectorized merge on the tile id + overlap filter + owner guard.

    Replication factor per row is ``length/tile + 1`` — pick ``tile``
    near the typical interval length. Skew: one pathologically long
    interval replicates everywhere (cap or split such rows upstream);
    a tile crossed by many intervals is the hot-partition case — smaller
    ``num_partitions`` granularity doesn't help, splitting the tile
    (smaller ``tile``) does. Column names must not collide across sides
    (rename upstream)."""
    if tile <= 0:
        raise ValueError("tile must be a positive integer")

    lschema, rschema = left_ds.schema(), right_ds.schema()
    all_cols: dict[str, pa.DataType] = dict(zip(lschema.names, lschema.types))
    for name, typ in zip(rschema.names, rschema.types):
        if name in all_cols:
            raise ValueError(f"column collision: {name!r} (rename before join)")
        all_cols[name] = typ
    lcols, rcols = list(lschema.names), list(rschema.names)

    def tag(side: str, start: str, end: str):
        def f(batch: pa.Table) -> pa.Table:
            s = batch.column(start).to_numpy().astype(np.int64)
            e = batch.column(end).to_numpy().astype(np.int64)
            if np.any(e < s):
                raise ValueError("interval end < start")
            t0 = s // np.int64(tile)
            t1 = e // np.int64(tile)
            reps = (t1 - t0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(s)), reps)
            # per-copy tile id: t0[row] + offset within the row's run
            offs = np.arange(reps.sum()) - np.repeat(
                np.cumsum(reps) - reps, reps)
            tiles = t0[idx] + offs
            from documentai_ray.stages._hashutil import hash_pkey

            pk = hash_pkey([pa.array(tiles, pa.int64())], num_partitions)
            cols: dict[str, pa.Array] = {}
            for name, typ in all_cols.items():
                if name in batch.column_names:
                    cols[name] = batch.column(name).take(
                        pa.array(idx, pa.int64())).cast(typ)
                else:
                    cols[name] = pa.nulls(len(idx), typ)
            cols["_side"] = pa.array([side] * len(idx), pa.string())
            cols["_tile"] = pa.array(tiles, pa.int64())
            cols["_pkey"] = pa.array(pk, pa.int32())
            return pa.table(cols)
        return f

    tagged = (left_ds.map_batches(tag("l", left_start, left_end),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(tag("r", right_start, right_end),
                                          batch_format="pyarrow")))

    def join_partition(gt: pa.Table) -> pa.Table:
        g = _group_df(gt)
        lg = g[g["_side"] == "l"][lcols + ["_tile"]]
        rg = g[g["_side"] == "r"][rcols + ["_tile"]]
        m = lg.merge(rg, on="_tile")
        ls, le = m[left_start], m[left_end]
        rs, re = m[right_start], m[right_end]
        owner = np.maximum(ls // tile, rs // tile)
        keep = (ls <= re) & (rs <= le) & (m["_tile"] == owner)
        out = m[keep].drop(columns=["_tile"])
        schema = pa.schema([(c, all_cols[c]) for c in out.columns])
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("_pkey").map_groups(join_partition,
                                              batch_format="pyarrow")


def relational_division(ds, *, key_col: str, div_col: str):
    """Relational DIVISION — keys related to ALL distinct divisor
    values ("customers who ordered in EVERY priority class", "hosts
    seen in EVERY crawl wave"): the classic for-all operator the join
    family (inner/semi/anti) can't express without a double negation.

    Set-containment made distributed-cheap by counting instead of
    subtracting: distinct (key, value) pairs fold on ONE exchange
    bounded by keys × values, the per-key distinct-value count on a
    second exchange bounded by keys, and a key qualifies iff its count
    equals the GLOBAL distinct-value count (a scalar — the divisor set
    itself never ships anywhere).  The anti-join formulation
    (key × divisor MINUS pairs) would materialize the cross product;
    this never builds it."""
    from ray.data.aggregate import Count

    total = (ds.select_columns([div_col])
             .groupby(div_col).count().count())
    if total == 0:
        raise ValueError("relational_division: empty divisor set")
    pairs = (ds.select_columns([key_col, div_col])
             .groupby([key_col, div_col]).aggregate(Count(alias_name="_d")))
    per_key = pairs.groupby(key_col).aggregate(Count(alias_name="_nv"))
    return (per_key.filter(expr=f"_nv >= {int(total)}")
            .select_columns([key_col]))
