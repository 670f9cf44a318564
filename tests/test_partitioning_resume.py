"""Salted url-hash partitioning, per-partition manifests, resume filter —
the north-rule scale plumbing (SURVEY §7.4, §7.5 risk 7)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from documentai_ray.sources import pages
from documentai_ray.state import manifest as mf
from documentai_ray.state import partitioning as pt
from tests.conftest import SF_SMOKE


class TestPartitioning:
    def test_partition_key_salting(self):
        heavy = {"heavy.example.com": 8}
        k1 = pt.partition_key("https://heavy.example.com/p/1", heavy)
        k2 = pt.partition_key("https://heavy.example.com/p/2", heavy)
        assert k1.startswith("heavy.example.com#")
        salts = {
            pt.partition_key(f"https://heavy.example.com/p/{i}", heavy)
            for i in range(100)
        }
        assert len(salts) == 8  # spread over exactly k sub-keys
        assert pt.partition_key("https://other.com/x", heavy) == "other.com"

    def test_bucket_stability(self):
        # content-addressed: independent of parallelism/task order
        assert pt.bucket_of("https://a.com/x", 16, {}) == pt.bucket_of(
            "https://a.com/x", 16, {})

    def test_detect_heavy_hosts(self, ray_session):
        ds = pages.pages_dataset(SF_SMOKE, with_dups=False)
        heavy = pt.detect_heavy_hosts(ds, share_threshold=0.10, salt_k=8)
        assert heavy == {"heavy.example.com": 8}

    def test_salting_flattens_bucket_skew(self, ray_session):
        import collections

        ds = pages.pages_dataset(SF_SMOKE, with_dups=False)
        urls = [r["url"] for r in ds.select_columns(["url"]).take_all()]
        n_buckets = 16

        def max_share(heavy):
            c = collections.Counter(pt.bucket_of(u, n_buckets, heavy) for u in urls)
            return max(c.values()) / len(urls)

        unsalted = max_share({})          # heavy host → one bucket has ~1/3
        salted = max_share({"heavy.example.com": 8})
        assert unsalted > 0.30
        assert salted < 0.20


class TestManifests:
    def test_atomic_write_and_read(self, tmp_path):
        out = str(tmp_path)
        mf.write_manifest(out, 3, rows=10, text_bytes=1234, digest=99)
        assert mf.completed_buckets(out) == {3}
        m = mf.read_manifests(out)[3]
        assert m["rows"] == 10 and m["text_bytes"] == 1234

    def test_torn_manifest_ignored(self, tmp_path):
        out = str(tmp_path)
        os.makedirs(os.path.join(out, "_manifests"))
        with open(os.path.join(out, "_manifests", "bucket=7.json"), "w") as f:
            f.write("{not json")
        assert mf.completed_buckets(out) == set()


class TestResumableRun:
    def test_run_writes_manifests_and_resume_skips(self, ray_session, tmp_path):
        from documentai_ray.pipelines.flagship import run_to_parquet

        out = os.path.join(str(tmp_path), "out")
        manifests = run_to_parquet(out, sf_dir=SF_SMOKE, n_buckets=8)
        assert len(manifests) == 8
        total_rows = sum(m["rows"] for m in manifests.values())
        docs = pages.synth_pages_table(SF_SMOKE, with_dups=False).num_rows
        assert total_rows == docs  # dups removed, one row per url

        # digests must be reproducible from disk (lineage check)
        again = mf.read_manifests(out)
        assert again == manifests

        # resume: all buckets complete → zero new work, manifests unchanged
        manifests2 = run_to_parquet(out, sf_dir=SF_SMOKE, n_buckets=8)
        assert {b: m["digest"] for b, m in manifests2.items()} == {
            b: m["digest"] for b, m in manifests.items()
        }

    def test_partial_failure_resume(self, ray_session, tmp_path):
        from documentai_ray.pipelines.flagship import run_to_parquet

        out = os.path.join(str(tmp_path), "out")
        run_to_parquet(out, sf_dir=SF_SMOKE, n_buckets=8)
        full = mf.read_manifests(out)
        # simulate a failed bucket: drop its manifest and its files
        victim = sorted(full)[0]
        os.remove(os.path.join(out, "_manifests", f"bucket={victim}.json"))
        shutil.rmtree(os.path.join(out, f"bucket={victim}"))
        assert mf.completed_buckets(out) == set(full) - {victim}
        # resume reprocesses ONLY the victim bucket; digest must match original
        redone = run_to_parquet(out, sf_dir=SF_SMOKE, n_buckets=8)
        assert redone[victim]["digest"] == full[victim]["digest"]
        assert redone[victim]["rows"] == full[victim]["rows"]

    def test_crash_mid_write_leaves_partial_files(self, ray_session, tmp_path):
        """A crash between write_parquet and the manifest leaves partial
        parquet files in bucket=<b>/ with NO manifest; the rerun must
        discard them (not append beside them) — same rows and digest as the
        clean run (ADVICE r1 resume-duplication hazard)."""
        from documentai_ray.pipelines.flagship import run_to_parquet

        out = os.path.join(str(tmp_path), "out")
        run_to_parquet(out, sf_dir=SF_SMOKE, n_buckets=8)
        full = mf.read_manifests(out)
        # simulate the crash: manifest gone, PARTIAL FILES LEFT IN PLACE
        victim = sorted(full)[0]
        os.remove(os.path.join(out, "_manifests", f"bucket={victim}.json"))
        bucket_dir = os.path.join(out, f"bucket={victim}")
        files = sorted(os.listdir(bucket_dir))
        assert files  # stale partials present
        redone = run_to_parquet(out, sf_dir=SF_SMOKE, n_buckets=8)
        assert redone[victim]["rows"] == full[victim]["rows"]  # NOT doubled
        assert redone[victim]["digest"] == full[victim]["digest"]


class TestRendezvousAssign:
    def test_minimal_movement_on_shard_add(self, ray_session):
        """THE rendezvous property: adding a shard moves ONLY the keys
        the new shard wins; nobody else changes assignment."""
        from documentai_ray.state.partitioning import rendezvous_assign
        ds = ray_session.data.from_items(
            [{"k": i} for i in range(300)])
        before = rendezvous_assign(ds, key_col="k",
                                   shards=["s0", "s1", "s2"]).to_pandas()
        after = rendezvous_assign(ds, key_col="k",
                                  shards=["s0", "s1", "s2", "s3"]).to_pandas()
        b = dict(zip(before["k"], before["shard"]))
        a = dict(zip(after["k"], after["shard"]))
        moved = {k for k in b if a[k] != b[k]}
        # every moved key moved TO the new shard, never between old ones
        assert all(a[k] == "s3" for k in moved)
        # and roughly 1/4 of keys move (exactly the s3-winners)
        assert 0 < len(moved) < 150

    def test_deterministic_and_exhaustive(self, ray_session):
        from documentai_ray.state.partitioning import rendezvous_assign
        ds = ray_session.data.from_items([{"k": i} for i in range(50)])
        a = rendezvous_assign(ds, key_col="k",
                              shards=["x", "y"]).to_pandas()
        b = rendezvous_assign(ds, key_col="k",
                              shards=["y", "x"]).to_pandas()  # order-free
        assert dict(zip(a["k"], a["shard"])) == dict(zip(b["k"], b["shard"]))
        assert set(a["shard"]) <= {"x", "y"}

    def test_empty_shards_raise(self, ray_session):
        import pytest
        from documentai_ray.state.partitioning import rendezvous_assign
        ds = ray_session.data.from_items([{"k": 1}])
        with pytest.raises(ValueError):
            rendezvous_assign(ds, key_col="k", shards=[])


class TestCoordinatedSample:
    def test_join_of_samples_is_sample_of_join(self, ray_session):
        """The defining identity: sampling parent and child with the
        same rule on the same key preserves every kept parent's
        children exactly."""
        import pandas as pd
        import ray.data

        from documentai_ray.state.partitioning import coordinated_sample

        parents = [{"k": i, "p": f"p{i}"} for i in range(200)]
        children = [{"k": i % 200, "c": j} for j, i in
                    enumerate(range(600))]
        sp = coordinated_sample(ray_session.data.from_items(parents),
                                key_col="k").to_pandas()
        sc = coordinated_sample(ray_session.data.from_items(children),
                                key_col="k").to_pandas()
        # identical key sets survive on both sides
        assert set(sp["k"]) == set(sc["k"].unique())
        # and every kept parent keeps ALL its children (3 each here)
        full = pd.DataFrame(children)
        for k in sp["k"]:
            assert (sc["k"] == k).sum() == (full["k"] == k).sum()

    def test_deterministic_and_parallelism_independent(self,
                                                       ray_session):
        from documentai_ray.state.partitioning import coordinated_sample

        rows = [{"k": i} for i in range(500)]
        outs = []
        for p in (1, 8):
            ds = ray_session.data.from_items(rows).repartition(p)
            outs.append(sorted(coordinated_sample(
                ds, key_col="k").to_pandas()["k"]))
        assert outs[0] == outs[1] and len(outs[0]) > 0

    def test_rejects_bad_accept(self, ray_session):
        import pytest

        from documentai_ray.state.partitioning import coordinated_sample

        ds = ray_session.data.from_items([{"k": 1}])
        with pytest.raises(ValueError):
            coordinated_sample(ds, key_col="k", accept_hex="xyz")
        with pytest.raises(ValueError):
            coordinated_sample(ds, key_col="k", accept_hex="")
