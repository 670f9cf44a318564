"""JSON column parsing and per-key running window aggregates."""

from __future__ import annotations

import pyarrow as pa


def test_parse_json_column(ray_session):
    import ray.data

    from documentai_ray.stages.jsoncol import parse_json_column

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "props": pa.array(['{"k": 7, "tag": "a"}', '{"k": 9}',
                           'not json', None], pa.string()),
    })
    out = parse_json_column(ray.data.from_arrow(t),
                            fields={"k": "int64", "tag": "string"}).to_pandas()
    out = out.set_index("id").sort_index()
    assert out.loc[1, "k"] == 7 and out.loc[1, "tag"] == "a"
    assert out.loc[2, "k"] == 9 and out.loc[2, "tag"] is None
    # malformed / null -> nulls, never an exception
    assert out.loc[3:4, "k"].isna().all()
    assert "props" not in out.columns


def test_running_per_key(ray_session):
    import ray.data

    from documentai_ray.stages.windows import running_per_key

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "o": pa.array([3, 1, 2, 1], pa.int64()),
        "v": pa.array([10, 1, 100, 5], pa.int64()),
    })
    out = running_per_key(ray.data.from_arrow(t), key_col="k",
                          order_cols=["o"], cum_col="v",
                          num_partitions=2).to_pandas()
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    assert list(out["seq"]) == [1, 2, 3, 1]
    assert list(out["running"]) == [1, 101, 111, 5]
