"""Bloom-filter join prefilter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_bloom_no_false_negatives_and_filters(ray_session):
    import ray.data

    from documentai_ray.stages.joins import bloom_prefilter, build_bloom

    dim_keys = np.arange(0, 1000, 7, dtype=np.int64)          # 143 keys
    dim = ray.data.from_arrow(pa.table({"k": pa.array(dim_keys, pa.int64())}))
    bloom = build_bloom(dim, key_col="k", m_bits=1 << 14)
    fact_keys = np.arange(5000, dtype=np.int64)
    fact = ray.data.from_arrow(pa.table({"k": pa.array(fact_keys, pa.int64())}))
    kept = bloom_prefilter(fact, bloom, key_col="k").to_pandas()["k"].to_numpy()
    # every true member survives (bloom guarantees no false negatives)
    assert np.isin(dim_keys, kept).all()
    # and the filter actually filters (few false positives at 16K bits/143 keys)
    assert len(kept) < 1000


def test_bloom_prefiltered_join_is_exact(ray_session):
    import ray.data

    from documentai_ray.stages.joins import (bloom_prefilter, build_bloom,
                                             hash_join)

    dim = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 5, 8], pa.int64()),
        "tag": pa.array(["a", "b", "c"], pa.string())}))
    fact = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(10)), pa.int64()),
        "v": pa.array(list(range(10)), pa.int64())}))
    bloom = build_bloom(dim.select_columns(["k"]), key_col="k",
                        m_bits=1 << 10)
    pre = bloom_prefilter(fact, bloom, key_col="k")
    out = hash_join(pre, dim, on="k", num_partitions=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [2, 5, 8]
    assert list(out["v"]) == [2, 5, 8]
    assert list(out["tag"]) == ["a", "b", "c"]


def test_bloom_snapshot_dedup_matches_plain(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import (dedup_against_snapshot,
                                             dedup_against_snapshot_bloom)

    new = ray.data.from_items(
        [{"doc_id": i, "text": f"doc body {i % 60}"} for i in range(200)])
    old = ray.data.from_items([{"text": f"doc body {j}"} for j in range(0, 60, 2)])
    plain = dedup_against_snapshot(new, old).to_pandas()
    bloom = dedup_against_snapshot_bloom(new, old).to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "text"]].to_numpy()))
    assert key(plain) == key(bloom)
    assert len(plain) == 100                      # odd residues survive


def test_bloom_snapshot_dedup_exact_under_heavy_fp(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import dedup_against_snapshot_bloom

    # 64-bit bloom for 50 keys → FP rate near 1: the exact anti-join must
    # still remove every false positive
    new = ray.data.from_items(
        [{"doc_id": i, "text": f"t{i}"} for i in range(300)])
    old = ray.data.from_items([{"text": f"t{j}"} for j in range(50)])
    out = dedup_against_snapshot_bloom(new, old, m_bits=64).to_pandas()
    assert sorted(out["doc_id"]) == list(range(50, 300))
