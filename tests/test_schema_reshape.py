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


class TestDeltaVarint:
    def test_hand_computed_bytes(self, ray_session):
        """Values [10, 10, 10, 138, 20000]: first costs 8, two dups
        cost 1 each, delta 128 costs 2 (8 bits -> 2 varint bytes),
        delta 19862 costs 3 (15 bits)."""
        from documentai_ray.stages.schema import delta_varint_size
        rows = [{"v": x} for x in [10, 10, 10, 138, 20000]]
        out = delta_varint_size(
            ray_session.data.from_items(rows).repartition(3),
            val_col="v").to_pandas()
        assert out.iloc[0].to_dict() == {
            "n": 5, "raw_bytes": 40, "delta_bytes": 8 + 1 + 1 + 2 + 3,
            "ratio_ppm": 15 * 1_000_000 // 40}

    def test_order_insensitive_and_empty_raises(self, ray_session):
        import pytest
        from documentai_ray.stages.schema import delta_varint_size
        a = [{"v": x} for x in [5, 1, 3]]
        b = [{"v": x} for x in [3, 5, 1]]
        ra = delta_varint_size(ray_session.data.from_items(a),
                               val_col="v").to_pandas()
        rb = delta_varint_size(ray_session.data.from_items(b),
                               val_col="v").to_pandas()
        assert ra.equals(rb)
        with pytest.raises(Exception):
            delta_varint_size(
                ray_session.data.from_items([{"v": 1}]).filter(
                    lambda r: False), val_col="v")


class TestNestList:
    def test_order_total_and_cross_block(self, ray_session):
        """Values arrive shuffled across blocks; the nested list must
        come back in order_cols order, per key."""
        from documentai_ray.stages.schema import nest_list
        rows = [{"k": 1, "o": 3, "v": "c"}, {"k": 1, "o": 1, "v": "a"},
                {"k": 2, "o": 1, "v": "z"}, {"k": 1, "o": 2, "v": "b"}]
        out = (nest_list(
            ray_session.data.from_items(rows).repartition(4),
            key_cols=["k"], order_cols=["o"], val_col="v",
            out_col="items").to_pandas().sort_values("k"))
        assert list(out["items"]) == [["a", "b", "c"], ["z"]]

    def test_roundtrip_with_posexplode(self, ray_session):
        from documentai_ray.stages.schema import (nest_list,
                                                  posexplode_tokens)
        import pyarrow as pa
        docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": pa.array(["x  y\tz", "solo"],
                                          pa.string())})
        toks = posexplode_tokens(ray_session.data.from_arrow(docs),
                                 id_cols=["doc_id"], text_col="text")
        out = (nest_list(toks, key_cols=["doc_id"], order_cols=["pos"],
                         val_col="token", out_col="tokens")
               .to_pandas().sort_values("doc_id"))
        assert list(out["tokens"]) == [["x", "y", "z"], ["solo"]]
