"""Fault-injection: a worker process dies mid-job (os._exit — the
single-node stand-in for losing a node on a 256-node cluster) and the
Ray Data streaming executor must retry the lost task and complete the
pipeline with exactly-correct results. Complements the
resume-from-checkpoint coverage (test_partitioning_resume.py): that
proves recovery ACROSS driver runs, this proves recovery WITHIN one."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import ray
import ray.data


def test_worker_death_mid_job_retries_and_completes():
    marker = os.path.join(tempfile.gettempdir(),
                          f"graft_kill_once_{os.getpid()}")
    if os.path.exists(marker):
        os.unlink(marker)

    def kill_once_then_square(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        # the task owning id==37 hard-kills its worker the FIRST time it
        # runs; the retry (marker exists) proceeds normally
        if 37 in ids and not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("boom")
            os._exit(1)
        return pa.table({"id": batch.column("id"),
                         "sq": pa.array((ids.astype(np.int64) ** 2))})

    ds = ray.data.range(200).map_batches(
        kill_once_then_square, batch_format="pyarrow", batch_size=20)
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert os.path.exists(marker), "the kill path never ran"
    os.unlink(marker)
    assert len(out) == 200
    assert (out["sq"] == out["id"] ** 2).all()


def test_transient_udf_exception_retries_with_retry_exceptions():
    marker = os.path.join(tempfile.gettempdir(),
                          f"graft_raise_once_{os.getpid()}")
    if os.path.exists(marker):
        os.unlink(marker)

    def raise_once(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        if 11 in ids and not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("flaky")
            raise RuntimeError("transient storage hiccup")
        return pa.table({"id": batch.column("id")})

    ds = ray.data.range(60).map_batches(
        raise_once, batch_format="pyarrow", batch_size=10,
        retry_exceptions=True)
    out = ds.to_pandas()
    assert os.path.exists(marker)
    os.unlink(marker)
    assert len(out) == 60
