"""blocked_linkage (stages/linkage.py): blocking isolation, threshold
semantics, and the O(len) edit-distance≤1 comparator."""
import numpy as np
import pandas as pd
import pyarrow as pa


def test_within_edit1_cases():
    from documentai_ray.stages.linkage import within_edit1

    assert within_edit1("abc", "abc")          # distance 0
    assert within_edit1("abc", "abd")          # substitution
    assert within_edit1("abc", "ab")           # deletion
    assert within_edit1("abc", "abcd")         # insertion at end
    assert within_edit1("abc", "xabc")         # insertion at start
    assert not within_edit1("abc", "axy")      # 2 substitutions
    assert not within_edit1("abc", "a")        # 2 deletions
    assert not within_edit1("abcd", "badc")    # transposition-ish, d=2+
    assert within_edit1("", "x") and not within_edit1("", "xy")


def test_within_edit1_matches_duckdb_levenshtein():
    import duckdb

    from documentai_ray.stages.linkage import within_edit1

    rng = np.random.default_rng(3)
    alpha = "abcx"
    cases = []
    for _ in range(200):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
        cases.append((a, b))
    con = duckdb.connect()
    for a, b in cases:
        d = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert within_edit1(a, b) == (d <= 1), (a, b, d)


def test_blocked_linkage_blocks_isolate_and_threshold(ray_session):
    import ray.data

    from documentai_ray.stages.linkage import blocked_linkage

    left = pa.table({
        "lid": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
        "block": pa.array(["a", "a", "b"], pa.string()),
    })
    right = pa.table({
        "rid": pa.array([101, 102, 103], pa.int64()),
        "w": pa.array([10, 29, 30], pa.int64()),
        "block": pa.array(["a", "a", "c"], pa.string()),
    })

    def scorer(pairs: pd.DataFrame) -> np.ndarray:
        return np.where(
            np.abs(pairs["v"].to_numpy() - pairs["w"].to_numpy()) <= 1,
            100, 0).astype(np.int64)

    out = blocked_linkage(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        block_col="block", scorer=scorer,
        out_cols=["lid", "rid"], threshold=100,
        num_partitions=4).to_pandas().sort_values(["lid", "rid"])
    # (1,101): same block, |10-10|<=1 -> kept.
    # (2,102): same block, |20-29|=9 -> dropped by threshold.
    # (3,103): value-identical but DIFFERENT blocks -> never a candidate.
    assert list(zip(out["lid"], out["rid"])) == [(1, 101)]
    assert list(out["score"]) == [100]


def test_blocked_linkage_column_collision_raises(ray_session):
    import pytest
    import ray.data

    from documentai_ray.stages.linkage import blocked_linkage

    t = pa.table({"x": pa.array([1], pa.int64()),
                  "block": pa.array(["a"], pa.string())})
    with pytest.raises(ValueError, match="collision"):
        blocked_linkage(ray.data.from_arrow(t), ray.data.from_arrow(t),
                        block_col="block", scorer=lambda p: [0],
                        out_cols=["x"], threshold=0)


def test_golden_record_per_field_latest_nonnull(ray_session):
    import ray.data

    from documentai_ray.stages.linkage import golden_record

    # key 1: newer row has NULL phone -> older phone must survive while
    # the newer email wins; key 2: single row passes through.
    t = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "ver": pa.array([0, 1, 2, 0], pa.int64()),
        "phone": pa.array(["111", "222", None, "999"], pa.string()),
        "email": pa.array([None, "a@x", "b@x", None], pa.string()),
    })
    out = golden_record(
        ray.data.from_arrow(t).repartition(3), key_col="k",
        order_col="ver", field_cols=["phone", "email"],
        num_partitions=2).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["phone"]) == ["222", "999"]
    assert list(out["email"]) == ["b@x", None]
    assert list(out["n_versions"]) == [3, 1]


def test_golden_record_all_null_field_stays_null(ray_session):
    import ray.data

    from documentai_ray.stages.linkage import golden_record

    t = pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "ver": pa.array([0, 1], pa.int64()),
        "f": pa.array([None, None], pa.string()),
    })
    out = golden_record(ray.data.from_arrow(t), key_col="k",
                        order_col="ver", field_cols=["f"]).to_pandas()
    assert len(out) == 1 and out["f"].isna().all()
