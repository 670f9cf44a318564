"""Per-partition lineage manifests + resume-from-checkpoint.

North-rule requirement: resumable from checkpoint with per-partition lineage
and metrics. The reference has none (a failed request is lost; gateway flags
``partial_success`` — SURVEY §4 "Checkpoint / resume"); this module is new
design:

- Output layout: ``out_dir/bucket=<b>/…parquet`` (Hive-partitioned by the
  content-addressed bucket id from state/partitioning.py).
- After a bucket's rows are fully written, a manifest
  ``out_dir/_manifests/bucket=<b>.json`` is written **atomically**
  (tmp file + ``os.replace``) recording row count, text bytes, and an
  order-insensitive content digest (sum of per-row md5-int64s mod 2^64) —
  the per-partition metric roll-up of SURVEY §7.4.
- Resume: ``completed_buckets`` lists manifests; the pipeline filters those
  buckets out *before* extraction, so finished partitions cost one hash +
  one predicate per row, not a re-run.

The digest doubles as the lineage check: a resumed run's digest per bucket
must equal the original's regardless of parallelism (content equality, not
block-order equality — FIXTURES.md §4).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

_MANIFEST_DIR = "_manifests"
_DIGEST_MOD = 1 << 64


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, _MANIFEST_DIR, f"bucket={bucket}.json")


def row_digest(url: str, text: str) -> int:
    """Signed-int64 row digest. Signed so Sum() aggregates stay in int64;
    wrap-around (numpy) and arbitrary-precision (Python) summation agree
    after the final ``% 2**64`` normalization."""
    h = hashlib.md5(f"{url}\x00{text}".encode("utf-8")).digest()
    return int.from_bytes(h[:8], "little", signed=True)


def add_digest_column(ds):
    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        d = [row_digest(u, t or "") for u, t in zip(urls, texts)]
        return batch.append_column("row_digest", pa.array(d, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def write_manifest(out_dir: str, bucket: int, rows: int, text_bytes: int, digest: int) -> None:
    os.makedirs(os.path.join(out_dir, _MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(out_dir, bucket)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"bucket": bucket, "rows": rows, "text_bytes": text_bytes,
             "digest": digest % _DIGEST_MOD},
            f, sort_keys=True,
        )
    os.replace(tmp, path)  # atomic on POSIX


def completed_buckets(out_dir: str) -> set[int]:
    d = os.path.join(out_dir, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return set()
    out: set[int] = set()
    for name in os.listdir(d):
        if name.startswith("bucket=") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    out.add(int(json.load(f)["bucket"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn manifest → treat bucket as incomplete
    return out


def read_manifests(out_dir: str) -> dict[int, dict]:
    d = os.path.join(out_dir, _MANIFEST_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.startswith("bucket=") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            out[int(m["bucket"])] = m
    return out


def clean_incomplete_buckets(out_dir: str) -> list[int]:
    """Delete ``bucket=<b>/`` output dirs that have NO manifest: these are
    partial writes from a crashed run. Without this, a rerun reprocesses
    the bucket and appends fresh UUID-named parquet files BESIDE the stale
    partials, and ``finalize_buckets`` (which reads back what is on disk)
    would attest a manifest with duplicated rows (ADVICE r1). The manifest
    is written atomically AFTER the bucket's files, so manifest-present ⇒
    files complete; manifest-absent ⇒ files untrusted. Returns the bucket
    ids removed."""
    import shutil

    done = completed_buckets(out_dir)
    removed: list[int] = []
    if not os.path.isdir(out_dir):
        return removed
    for name in os.listdir(out_dir):
        if not name.startswith("bucket="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b not in done:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            removed.append(b)
    return removed


def filter_completed(ds, done: set[int]):
    """Drop rows of already-completed buckets (vectorized predicate)."""
    if not done:
        return ds
    done_arr = pa.array(sorted(done), pa.int32())

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("bucket"), value_set=done_arr))
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def finalize_buckets(ds, out_dir: str) -> dict[int, dict]:
    """Aggregate per-bucket metrics from the *written* dataset and emit
    manifests. ``ds`` must carry bucket/url/text columns; aggregation is a
    partial-agg groupby over (bucket) — tiny output (≤ n_buckets rows)."""
    from ray.data.aggregate import Count, Sum

    with_d = add_digest_column(ds)

    def text_len(batch: pa.Table) -> pa.Table:
        tb = pc.binary_length(pc.cast(batch.column("text"), pa.large_binary()))
        return batch.append_column("text_bytes", pc.cast(tb, pa.int64()))

    with_d = with_d.map_batches(text_len, batch_format="pyarrow")
    agg = (
        with_d.groupby("bucket")
        .aggregate(Count(alias_name="rows"),
                   Sum("text_bytes", alias_name="text_bytes"),
                   Sum("row_digest", alias_name="digest"))
        .to_pandas()
    )
    result: dict[int, dict] = {}
    for _, row in agg.iterrows():
        b = int(row["bucket"])
        write_manifest(out_dir, b, int(row["rows"]), int(row["text_bytes"]),
                       int(row["digest"]) % _DIGEST_MOD)
        result[b] = read_manifests(out_dir)[b]
    return result
