"""Generic resumable pipeline runner.

``flagship.run_to_parquet`` hard-wires the flagship chain; any other
heavy pipeline (corpus line dedup, passage removal, a curation sweep)
needs the same checkpoint contract at 100 TB: bucket the INPUT on a
salted url hash, skip buckets whose manifest already exists, discard
manifest-less partial outputs before rerunning, and attest each bucket
from what is actually ON DISK. This runner lifts that contract out of
the flagship so it wraps ANY ds→ds pipeline function.

Requirements on ``pipeline_fn``: input-row → output-row mapping may be
arbitrary (explode/aggregate within a bucket is fine) but must PRESERVE
the ``bucket`` column it receives, so outputs land in the right
partition; ``url_col`` + ``text_col`` of the OUTPUT feed the digest (use
any stable pair of columns).
"""

from __future__ import annotations

import os
from typing import Callable

from documentai_ray.state import manifest as mf
from documentai_ray.state.partitioning import add_bucket_column, detect_heavy_hosts


def run_pipeline_to_parquet(
    out_dir: str,
    ds,
    pipeline_fn: Callable,
    *,
    n_buckets: int = 16,
    heavy_share: float = 0.10,
    salt_k: int = 8,
    url_col: str = "url",
    text_col: str = "text",
) -> dict[int, dict]:
    """Bucket → skip completed → run ``pipeline_fn`` → write → attest.
    Re-invocation after a crash reprocesses only unfinished buckets."""
    heavy = detect_heavy_hosts(ds, share_threshold=heavy_share, salt_k=salt_k)
    ds = add_bucket_column(ds, n_buckets, heavy)
    mf.clean_incomplete_buckets(out_dir)
    done = mf.completed_buckets(out_dir)
    ds = mf.filter_completed(ds, done)
    out = pipeline_fn(ds)
    os.makedirs(out_dir, exist_ok=True)
    out.write_parquet(out_dir, partition_cols=["bucket"])

    import ray.data

    written = ray.data.read_parquet(out_dir, columns=["bucket", url_col,
                                                      text_col])
    if url_col != "url" or text_col != "text":
        import pyarrow as pa

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({"bucket": batch.column("bucket"),
                             "url": batch.column(url_col).cast(pa.string()),
                             "text": batch.column(text_col).cast(pa.large_string())})

        written = written.map_batches(rename, batch_format="pyarrow")
    return mf.finalize_buckets(written, out_dir)
