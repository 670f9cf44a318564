"""grouped_ntile (stages/aggregates.py): SQL NTILE parity incl. the
uneven-tile rule, duplicate-value tie-break, and n < k."""
import duckdb
import numpy as np
import pyarrow as pa


def _duck_ntile(df, k):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        "SELECT id, key, v, ntile(?) OVER (PARTITION BY key "
        "ORDER BY v, id) AS tile FROM t", [k]).df()


def test_grouped_ntile_matches_sql(ray_session):
    import pandas as pd
    import ray.data

    from documentai_ray.stages.aggregates import grouped_ntile

    rng = np.random.default_rng(7)
    n = 233
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "key": rng.choice(["a", "b", "c"], n),
        # heavy duplication so tie groups span partitions
        "v": rng.integers(0, 9, n).astype("int64"),
    })
    out = grouped_ntile(
        ray.data.from_arrow(pa.Table.from_pandas(df)),
        key_col="key", val_col="v", tiebreak_col="id", k=7,
        num_partitions=5).to_pandas().sort_values("id")
    want = _duck_ntile(df, 7).sort_values("id")
    assert list(out["tile"]) == list(want["tile"])


def test_grouped_ntile_fewer_rows_than_tiles(ray_session):
    import pandas as pd
    import ray.data

    from documentai_ray.stages.aggregates import grouped_ntile

    df = pd.DataFrame({"id": [1, 2, 3], "key": ["x"] * 3,
                       "v": [5, 5, 1]})
    df = df.astype({"id": "int64", "v": "int64"})
    out = grouped_ntile(
        ray.data.from_arrow(pa.Table.from_pandas(df)),
        key_col="key", val_col="v", tiebreak_col="id", k=10,
        num_partitions=2).to_pandas().sort_values("id")
    want = _duck_ntile(df, 10).sort_values("id")
    assert list(out["tile"]) == list(want["tile"])


class TestGroupedLinreg:
    def test_exact_stats_and_trunc_slope(self, ray_session):
        from documentai_ray.stages.aggregates import grouped_linreg
        # key a: y = 3x exactly -> slope 3, cov/var exact
        # key b: negative covariance with non-divisible ratio -> trunc
        #        toward zero (Python floor would give a different value)
        rows = ([{"k": "a", "x": x, "y": 3 * x} for x in (1, 2, 3, 4)]
                + [{"k": "b", "x": 1, "y": 10}, {"k": "b", "x": 2, "y": 3}])
        out = grouped_linreg(ray_session.data.from_items(rows),
                             key_col="k", x_col="x", y_col="y").to_pandas()
        a = out[out["k"] == "a"].iloc[0]
        assert (a["n"], a["sum_x"], a["sum_y"]) == (4, 10, 30)
        assert a["cov_num"] == 4 * 90 - 10 * 30  # n*Sxy - Sx*Sy = 60
        assert a["var_num"] == 4 * 30 - 100      # 20
        assert a["slope_q"] == 3
        b = out[out["k"] == "b"].iloc[0]
        # cov_num = 2*16 - 3*13 = -7, var_num = 2*5 - 9 = 1 -> slope -7
        assert (b["cov_num"], b["var_num"], b["slope_q"]) == (-7, 1, -7)

    def test_trunc_not_floor(self, ray_session):
        from documentai_ray.stages.aggregates import grouped_linreg
        # cov_num = -9, var_num = 6: trunc(-1.5) -> -1 (floor gives -2) —
        # pins the SQL `//` parity choice on negative covariance.
        rows = [{"k": "c", "x": 0, "y": 3}, {"k": "c", "x": 1, "y": 1},
                {"k": "c", "x": 2, "y": 0}]
        out = grouped_linreg(ray_session.data.from_items(rows),
                             key_col="k", x_col="x", y_col="y").to_pandas()
        r = out.iloc[0]
        assert (r["cov_num"], r["var_num"]) == (-9, 6)
        assert r["slope_q"] == -1


def test_global_row_index_matches_row_number(ray_session):
    import pandas as pd
    import ray.data

    from documentai_ray.stages.aggregates import global_row_index

    rng = np.random.default_rng(11)
    n = 307
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        # heavy duplication so tie groups span blocks
        "v": rng.integers(0, 12, n).astype("int64"),
    })
    out = global_row_index(
        ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8),
        val_col="v", tiebreak_col="id",
        num_partitions=5).to_pandas().sort_values("id")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT id, row_number() OVER (ORDER BY v, id) - 1 AS row_idx "
        "FROM t").df().sort_values("id")
    assert list(out["row_idx"]) == list(want["row_idx"])
    # contiguity: exactly 0..n-1, each once
    assert sorted(out["row_idx"]) == list(range(n))


def test_global_row_index_parallelism_invariant(ray_session):
    import pandas as pd
    import ray.data

    from documentai_ray.stages.aggregates import global_row_index

    df = pd.DataFrame({"id": np.arange(64, dtype="int64"),
                       "v": (np.arange(64, dtype="int64") * 7) % 5})
    outs = []
    for blocks in (1, 9):
        o = global_row_index(
            ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(blocks),
            val_col="v", tiebreak_col="id").to_pandas().sort_values("id")
        outs.append(list(o["row_idx"]))
    assert outs[0] == outs[1]


def test_grouped_cume_dist_ties_and_bounds(ray_session):
    """cume_dist: peers share the inclusive cumulative count, the group
    maximum lands exactly at 10^6, and a singleton group is 10^6 with
    no special case (count-itself semantics)."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.aggregates import grouped_cume_dist

    df = pd.DataFrame({
        "id": np.arange(6, dtype="int64"),
        "key": ["a", "a", "a", "a", "a", "b"],
        "v": np.array([1, 2, 2, 2, 9, 5], dtype="int64"),
    })
    out = (grouped_cume_dist(
        ray.data.from_arrow(pa.Table.from_pandas(df)),
        key_col="key", val_col="v")
        .to_pandas().sort_values("id"))
    # group a (n=5): v=1 -> 1/5, v=2 ties -> 4/5 each, v=9 -> 5/5
    assert list(out["cume_ppm"]) == [
        200_000, 800_000, 800_000, 800_000, 1_000_000, 1_000_000]


def test_grouped_cume_dist_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from documentai_ray.stages.aggregates import grouped_cume_dist

    rng = np.random.default_rng(11)
    n = 311
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "key": rng.choice(["x", "y", "z"], n),
        "v": rng.integers(0, 12, n).astype("int64"),
    })
    out = (grouped_cume_dist(
        ray.data.from_arrow(pa.Table.from_pandas(df)),
        key_col="key", val_col="v")
        .to_pandas().sort_values("id"))
    want = duckdb.sql(
        "SELECT id, count(*) OVER (PARTITION BY key ORDER BY v) "
        "* 1000000 // count(*) OVER (PARTITION BY key) AS cume_ppm "
        "FROM df ORDER BY id").df()
    assert list(out["cume_ppm"]) == list(want["cume_ppm"])
