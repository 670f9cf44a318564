"""TFRecord container sink + source — the TensorFlow-ecosystem shard
format for training data. The CONTAINER format (length-prefixed records
with masked CRC32C integrity checks) is implemented to spec from the
public framing definition:

    uint64 length · uint32 masked_crc32c(length)
    byte   data[length] · uint32 masked_crc32c(data)
    mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8   (all mod 2³²)

CRC32C (Castagnoli, reflected poly 0x82F2437A8... i.e. 0x1EDC6F41) is
computed with a numpy 8-bit table — no tensorflow/crc32c dependency.
Record payloads here are the caller's bytes (we serialize rows as
canonical JSON like the jsonl sink — protobuf ``Example`` encoding would
slot into the same record body); a reader that validates CRCs rejects
any corrupt/truncated shard instead of silently yielding garbage.

Distribution contract matches the WET/jsonl sinks: key-hash bucketed
shards, one write task per shard, atomic publish, byte-deterministic
output.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pyarrow as pa

__all__ = ["crc32c", "write_tfrecord_shards", "read_tfrecord"]

_POLY = 0x82F63B78          # reflected Castagnoli polynomial


def _make_table() -> np.ndarray:
    tab = np.empty(256, np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_POLY if c & 1 else 0)
        tab[i] = c
    return tab


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    crc = np.uint32(0xFFFFFFFF)
    arr = np.frombuffer(data, np.uint8)
    tab = _TABLE
    c = int(crc)
    for b in arr.tolist():
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return int(c) ^ 0xFFFFFFFF


def _masked(c: int) -> int:
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _write_record(f, data: bytes) -> None:
    hdr = struct.pack("<Q", len(data))
    f.write(hdr)
    f.write(struct.pack("<I", _masked(crc32c(hdr))))
    f.write(data)
    f.write(struct.pack("<I", _masked(crc32c(data))))


def iter_tfrecords(blob: bytes):
    """Yield record payloads, validating both CRCs (ValueError on any
    mismatch/truncation — corrupt shards must fail loudly)."""
    pos, n = 0, len(blob)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated record header")
        (length,) = struct.unpack_from("<Q", blob, pos)
        (hcrc,) = struct.unpack_from("<I", blob, pos + 8)
        if _masked(crc32c(blob[pos:pos + 8])) != hcrc:
            raise ValueError("header crc mismatch")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("truncated record body")
        data = blob[pos:pos + length]
        (dcrc,) = struct.unpack_from("<I", blob, pos + length)
        if _masked(crc32c(data)) != dcrc:
            raise ValueError("data crc mismatch")
        pos += length + 4
        yield data


def write_tfrecord_shards(ds, out_dir: str, *, num_shards: int = 8,
                          key_col: str = "url"):
    """Distributed TFRecord sink (records = canonical-JSON rows).
    Returns a manifest Dataset of (path, n_records)."""
    from documentai_ray.stages.dedup import _add_pkey

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(g) -> pa.Table:
        b = int(g["_pkey"].iloc[0])
        g = g.drop(columns=["_pkey"]).sort_values(key_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{b:02d}.tfrecord")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for rec in g.to_dict(orient="records"):
                _write_record(f, json.dumps(
                    rec, sort_keys=True, ensure_ascii=False).encode("utf-8"))
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(g)], pa.int64())})

    return (_add_pkey(ds, key_col, num_shards)
            .groupby("_pkey")
            .map_groups(write_bucket, batch_format="pandas"))


def read_tfrecord(paths: list, *, num_cpus: float = 0.5):
    """Distributed CRC-validating TFRecord ingestion: one parse task per
    shard → Dataset of the JSON-decoded records."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                blob = f.read()
            for data in iter_tfrecords(blob):
                rows.append(json.loads(data.decode("utf-8")))
        return pa.Table.from_pylist(rows)

    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return ds.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1, num_cpus=num_cpus)
