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
