"""salted_join (skew-aware partitioned hash join) — output must be
row-identical to hash_join for every ``how``, with the hot key's rows
routed across multiple salt sub-buckets instead of one reducer."""

from __future__ import annotations

import zlib

import pandas as pd
import pytest


def _mk_sides():
    import ray.data

    # fact: heavy key "hot" carries half the rows; 6 cold keys + one
    # dangling key with no dim match (exercises left/anti)
    keys = (["hot"] * 60
            + [f"k{i}" for i in range(6) for _ in range(8)]
            + ["dangling"] * 4)
    fact = ray.data.from_items(
        [{"k": k, "v": i} for i, k in enumerate(keys)]).repartition(5)
    # dim: one row per key except "dangling"; "hot" has TWO dim rows so
    # replication must not duplicate matches
    dim_rows = [{"k": "hot", "w": 100}, {"k": "hot", "w": 101}]
    dim_rows += [{"k": f"k{i}", "w": i} for i in range(6)]
    dim = ray.data.from_items(dim_rows).repartition(3)
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_matches_hash_join(ray_session, how):
    from documentai_ray.stages.joins import hash_join, salted_join

    fact, dim = _mk_sides()
    want = hash_join(fact, dim, on="k", how=how,
                     num_partitions=16).to_pandas()
    got = salted_join(fact, dim, on="k", heavy_keys={"hot": 8}, how=how,
                      num_partitions=16).to_pandas()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    canon = lambda df: (df[cols].sort_values(cols, kind="mergesort")
                        .reset_index(drop=True))
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_salt_actually_spreads_the_hot_key():
    # the routing formula: 8 salts of the hot key must land in >1 of 32
    # partitions (deterministic arithmetic, no Ray needed)
    pks = {zlib.crc32(f"hot\x1f{s}".encode()) % 32 for s in range(8)}
    assert len(pks) > 1


def test_salted_join_empty_heavy_map_is_plain_join(ray_session):
    from documentai_ray.stages.joins import hash_join, salted_join

    fact, dim = _mk_sides()
    want = hash_join(fact, dim, on="k", num_partitions=8).to_pandas()
    got = salted_join(fact, dim, on="k", heavy_keys={},
                      num_partitions=8).to_pandas()
    cols = sorted(got.columns)
    canon = lambda df: (df[cols].sort_values(cols, kind="mergesort")
                        .reset_index(drop=True))
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_salted_join_column_collision_raises(ray_session):
    import ray.data

    from documentai_ray.stages.joins import salted_join

    a = ray.data.from_items([{"k": "x", "v": 1}])
    b = ray.data.from_items([{"k": "x", "v": 2}])
    with pytest.raises(ValueError, match="collision"):
        salted_join(a, b, on="k", heavy_keys={})


def test_hash_join_preserves_big_int64(ray_session):
    """Regression: the tagged-union null-fill used to degrade int64
    columns to float64 in pandas, silently rounding values above 2^53."""
    import ray.data

    from documentai_ray.stages.joins import hash_join

    big = [(1 << 62) + 12345678901234567 + i for i in range(4)]
    left = ray.data.from_items(
        [{"k": f"h{i % 2}", "lhash": big[i]} for i in range(4)])
    right = ray.data.from_items(
        [{"k": "h0", "w": (1 << 61) + 7}, {"k": "h1", "w": (1 << 61) + 9}])
    out = hash_join(left, right, on="k", num_partitions=4).to_pandas()
    assert sorted(out["lhash"].tolist()) == sorted(big)
    assert set(out["w"].tolist()) == {(1 << 61) + 7, (1 << 61) + 9}


def test_hash_join_outer(ray_session):
    import ray.data

    from documentai_ray.stages.joins import hash_join

    left = ray.data.from_items(
        [{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    right = ray.data.from_items(
        [{"k": "b", "w": 20}, {"k": "c", "w": 30}])
    out = hash_join(left, right, on="k", how="outer",
                    num_partitions=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["a", "b", "c"]
    assert out["v"].tolist()[1] == 2 and pd.isna(out["v"].iloc[2])
    assert out["w"].tolist()[1] == 20 and pd.isna(out["w"].iloc[0])
