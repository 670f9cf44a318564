"""Sharded ``.jsonl.gz`` sink + source — the de-facto interchange format
for web-text training corpora (C4 / The Pile / RefinedWeb distribute as
gzipped JSON-lines shards).

Same distribution contract as the WET sink (functions/warc.py): rows
hash-bucket by a key column into ``num_shards`` shard files, one write
task per shard, ``os.replace`` atomic publish so a crashed writer leaves
no half-visible shard (resume unit = shard file). Records serialize with
``sort_keys`` + ``ensure_ascii=False`` and one ``\\n`` per record —
byte-deterministic output for a given row set, so shard digests are
reproducible across runs and parallelism levels.
"""

from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa

__all__ = ["write_jsonl_shards", "read_jsonl"]


def write_jsonl_shards(ds, out_dir: str, *, num_shards: int = 8,
                       key_col: str = "url", level: int = 6):
    """Distributed JSONL sink. Returns a manifest Dataset of
    ``(path, n_records)`` — one row per published shard."""
    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        g = g.drop(columns=["_pkey"]).sort_values(key_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{b:02d}.jsonl.gz")
        tmp = path + ".tmp"
        # mtime=0 keeps the gzip container byte-deterministic too
        with open(tmp, "wb") as raw, gzip.GzipFile(
                fileobj=raw, mode="wb", compresslevel=level, mtime=0) as f:
            for rec in g.to_dict(orient="records"):
                f.write(json.dumps(rec, sort_keys=True,
                                   ensure_ascii=False).encode("utf-8"))
                f.write(b"\n")
        os.replace(tmp, path)  # atomic publish per shard
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(g)], pa.int64())})

    return (_add_pkey(ds, key_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))


def read_jsonl(paths: list, *, num_cpus: float = 0.5):
    """Distributed JSONL ingestion: one parse task per shard file →
    Dataset of the records (schema = union of keys, Arrow-inferred)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch.column("path").to_pylist():
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rt", encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rows.append(json.loads(line))
        return pa.Table.from_pylist(rows)

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)


def write_csv_shards(ds, out_dir: str, *, num_shards: int = 8,
                     key_col: str = "url"):
    """Distributed CSV sink, same contract as the jsonl sink (key-hash
    bucketed shards, atomic publish, byte-deterministic): QUOTE_ALL +
    ``\\r\\n`` line terminator per RFC 4180, so embedded newlines/quotes
    in text columns round-trip exactly. Header row per shard."""
    import csv
    import io

    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        g = g.drop(columns=["_pkey"]).sort_values(key_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{b:02d}.csv")
        tmp = path + ".tmp"
        buf = io.StringIO()
        w = csv.writer(buf, quoting=csv.QUOTE_ALL, lineterminator="\r\n")
        w.writerow(list(g.columns))
        for rec in g.itertuples(index=False):
            w.writerow(list(rec))
        with open(tmp, "wb") as f:
            f.write(buf.getvalue().encode("utf-8"))
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(g)], pa.int64())})

    return (_add_pkey(ds, key_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))


def read_csv_shards(paths: list, *, num_cpus: float = 0.5):
    """Distributed RFC 4180 CSV ingestion: one parse task per shard."""
    import csv
    import io

    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                text = f.read().decode("utf-8")
            r = csv.reader(io.StringIO(text))
            header = next(r)
            for rec in r:
                rows.append(dict(zip(header, rec)))
        return pa.Table.from_pylist(rows)

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)


def write_ipc_shards(ds, out_dir: str, *, num_shards: int = 8,
                     key_col: str = "url"):
    """Arrow IPC (Feather V2) shard sink — the zero-copy columnar
    interchange format: a reader memory-maps record batches without any
    parse/decode step (the natural hand-off format between Arrow-native
    engines). Same bucketed atomic-publish contract as the other
    sinks."""
    import pyarrow.ipc as ipc

    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        g = g.drop(columns=["_pkey"]).sort_values(key_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{b:02d}.arrow")
        tmp = path + ".tmp"
        t = pa.Table.from_pandas(g, preserve_index=False)
        with ipc.new_file(tmp, t.schema) as w:
            w.write_table(t)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(g)], pa.int64())})

    return (_add_pkey(ds, key_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))


def read_ipc_shards(paths: list, *, num_cpus: float = 0.5):
    """Distributed memory-mapped IPC ingestion: one zero-copy open per
    shard."""
    import pyarrow.ipc as ipc
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            with ipc.open_file(pa.memory_map(p)) as r:
                tables.append(r.read_all())
        return pa.concat_tables(tables)

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)


def write_orc_shards(ds, out_dir: str, *, num_shards: int = 8,
                     key_col: str = "url"):
    """ORC shard sink (the Hive/Trino lake format, via pyarrow.orc) —
    same bucketed atomic-publish contract as the parquet/IPC sinks;
    rounds out the columnar interchange trio (parquet / Arrow IPC /
    ORC)."""
    import pyarrow.orc as orc

    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        g = g.drop(columns=["_pkey"]).sort_values(key_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{b:02d}.orc")
        tmp = path + ".tmp"
        orc.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(g)], pa.int64())})

    return (_add_pkey(ds, key_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))


def read_orc_shards(paths: list, *, num_cpus: float = 0.5):
    """Distributed ORC ingestion: one reader task per shard."""
    import pyarrow.orc as orc
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [orc.read_table(p) for p in batch.column("path").to_pylist()])

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)
