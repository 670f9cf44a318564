"""unpivot (schema.unpivot): melt semantics, type guard, empty edge."""

import pyarrow as pa
import pytest


class TestUnpivot:
    def test_melt_values_and_order(self, ray_session):
        from documentai_ray.stages.schema import unpivot
        ds = ray_session.data.from_items(
            [{"id": 1, "a": 10.0, "b": 20.0},
             {"id": 2, "a": 30.0, "b": 40.0}])
        out = unpivot(ds, id_cols=["id"], value_cols=["a", "b"],
                      var_name="m", value_name="v").to_pandas()
        got = {(r["id"], r["m"]): r["v"] for _, r in out.iterrows()}
        assert got == {(1, "a"): 10.0, (1, "b"): 20.0,
                       (2, "a"): 30.0, (2, "b"): 40.0}
        assert len(out) == 4

    def test_conflicting_value_types_raise(self, ray_session):
        from documentai_ray.stages.schema import unpivot
        ds = ray_session.data.from_items([{"id": 1, "a": 1, "b": "x"}])
        with pytest.raises(Exception, match="conflicting"):
            unpivot(ds, id_cols=["id"],
                    value_cols=["a", "b"]).to_pandas()

    def test_no_value_cols_raise(self, ray_session):
        from documentai_ray.stages.schema import unpivot
        ds = ray_session.data.from_items([{"id": 1}])
        with pytest.raises(ValueError):
            unpivot(ds, id_cols=["id"], value_cols=[])


class TestPosexplodeTokens:
    def test_positions_and_order(self, ray_session):
        from documentai_ray.stages.schema import posexplode_tokens
        ds = ray_session.data.from_items([
            {"id": 1, "t": "a  b\tc"},
            {"id": 2, "t": " x "},
            {"id": 3, "t": ""},
            {"id": 4, "t": None},
        ])
        out = posexplode_tokens(ds, id_cols=["id"],
                                text_col="t").to_pandas()
        got = sorted(map(tuple, out[["id", "pos", "token"]].to_numpy()))
        assert got == [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "x")]

    def test_empty_batch(self, ray_session):
        from documentai_ray.stages.schema import posexplode_tokens
        ds = ray_session.data.from_items([{"id": 1, "t": ""}])
        out = posexplode_tokens(ds, id_cols=["id"],
                                text_col="t").to_pandas()
        assert len(out) == 0
