"""Declarative data-quality suite (stages/dq.py): every check type with
planted violations, NULL semantics, and the empty-table edge."""

import pyarrow as pa


def _report_dict(tbl: pa.Table) -> dict:
    d = tbl.to_pydict()
    return {c: (v, t, p) for c, v, t, p in
            zip(d["check"], d["violations"], d["total_rows"], d["passed"])}


class TestRowScopeChecks:
    def test_fused_pass_all_types(self, ray_session):
        from documentai_ray.stages.dq import (AcceptedValues, InRange,
                                              NotNull, dq_report)
        ds = ray_session.data.from_items([
            {"a": 1, "s": "x", "v": 5.0},
            {"a": None, "s": "y", "v": 50.0},
            {"a": 3, "s": "zz", "v": -1.0},
            {"a": None, "s": None, "v": None},
        ])
        rep = _report_dict(dq_report(ds, [
            NotNull("a"),
            AcceptedValues("s", ("x", "y")),
            InRange("v", 0.0, 10.0),
        ]))
        assert rep["not_null:a"] == (2, 4, False)
        # 'zz' and NULL both violate the accepted domain
        assert rep["accepted_values:s"] == (2, 4, False)
        # -1.0 and 50.0 out of [0,10]; NULL cannot be attested in-range
        assert rep["in_range:v"] == (3, 4, False)

    def test_all_green(self, ray_session):
        from documentai_ray.stages.dq import InRange, NotNull, dq_report
        ds = ray_session.data.from_items(
            [{"a": i, "v": float(i)} for i in range(10)])
        rep = _report_dict(dq_report(ds, [NotNull("a"),
                                          InRange("v", 0.0, 9.0)]))
        assert rep["not_null:a"] == (0, 10, True)
        assert rep["in_range:v"] == (0, 10, True)


class TestUnique:
    def test_excess_rows_counted(self, ray_session):
        from documentai_ray.stages.dq import Unique, dq_report
        # key 7 appears 3x, key 8 appears 2x -> violations = 2 + 1
        ds = ray_session.data.from_items(
            [{"k": 7}, {"k": 7}, {"k": 7}, {"k": 8}, {"k": 8}, {"k": 9}])
        rep = _report_dict(dq_report(ds, [Unique("k")]))
        assert rep["unique:k"] == (3, 6, False)

    def test_nulls_group_together(self, ray_session):
        from documentai_ray.stages.dq import Unique, dq_report
        ds = ray_session.data.from_items(
            [{"k": None}, {"k": None}, {"k": 1}])
        rep = _report_dict(dq_report(ds, [Unique("k")]))
        assert rep["unique:k"] == (1, 3, False)


class TestForeignKey:
    def test_orphans_and_null_child_keys(self, ray_session):
        from documentai_ray.stages.dq import ForeignKey, dq_report
        child = ray_session.data.from_items(
            [{"fk": 1}, {"fk": 1}, {"fk": 2}, {"fk": 99}, {"fk": None}])
        ref = ray_session.data.from_items([{"id": 1}, {"id": 2}, {"id": 3}])
        rep = _report_dict(dq_report(
            child, [ForeignKey("fk", "ref")],
            ref_datasets={"ref": (ref, "id")}))
        # 99 (1 row) + NULL (1 row) are orphans; both fk=1 rows match
        assert rep["foreign_key:fk->ref"] == (2, 5, False)

    def test_duplicate_ref_keys_are_fine(self, ray_session):
        from documentai_ray.stages.dq import ForeignKey, dq_report
        child = ray_session.data.from_items([{"fk": 1}, {"fk": 2}])
        ref = ray_session.data.from_items([{"id": 1}, {"id": 1}, {"id": 2}])
        rep = _report_dict(dq_report(
            child, [ForeignKey("fk", "ref")],
            ref_datasets={"ref": (ref, "id")}))
        assert rep["foreign_key:fk->ref"] == (0, 2, True)


class TestReportShape:
    def test_declared_order_preserved(self, ray_session):
        from documentai_ray.stages.dq import (NotNull, Unique, dq_report)
        ds = ray_session.data.from_items([{"a": 1, "b": 2}])
        tbl = dq_report(ds, [Unique("b"), NotNull("a")])
        assert tbl.column("check").to_pylist() == ["unique:b", "not_null:a"]
        assert tbl.schema.field("violations").type == pa.int64()
        assert tbl.schema.field("passed").type == pa.bool_()


class TestBenfordAudit:
    def test_shares_and_deviation_exact(self, ray_session):
        from documentai_ray.stages.dq import BENFORD_PPM, benford_audit
        # key A: values 1x, 19x, 2x, 2xx -> digits 1,1,2,2
        rows = [{"k": "A", "v": 10}, {"k": "A", "v": 199},
                {"k": "A", "v": 25}, {"k": "A", "v": 250}]
        ds = ray_session.data.from_items(rows).repartition(2)
        out = benford_audit(ds, key_col="k", val_col="v").to_pandas()
        got = {r["digit"]: (r["n_values"], r["share_ppm"], r["dev_ppm"])
               for _, r in out.iterrows()}
        assert got["1"] == (2, 500000, 500000 - BENFORD_PPM[1])
        assert got["2"] == (2, 500000, 500000 - BENFORD_PPM[2])

    def test_nonpositive_excluded(self, ray_session):
        from documentai_ray.stages.dq import benford_audit
        rows = [{"k": "A", "v": 0}, {"k": "A", "v": -5},
                {"k": "A", "v": 7}]
        ds = ray_session.data.from_items(rows)
        out = benford_audit(ds, key_col="k", val_col="v").to_pandas()
        assert len(out) == 1
        assert out["digit"].iloc[0] == "7"
        assert out["n_values"].iloc[0] == 1
        assert out["share_ppm"].iloc[0] == 1000000

    def test_constants_match_log_law(self):
        import math
        from documentai_ray.stages.dq import BENFORD_PPM
        for d, ppm in BENFORD_PPM.items():
            assert ppm == round(math.log10(1 + 1 / d) * 1_000_000)
        assert sum(BENFORD_PPM.values()) == 1_000_000


class TestImputeMode:
    def test_fill_uses_group_mode_with_tiebreak(self, ray_session):
        from documentai_ray.stages.dq import impute_group_mode
        rows = [
            {"id": 0, "g": 1, "v": "x"}, {"id": 1, "g": 1, "v": "x"},
            {"id": 2, "g": 1, "v": "y"}, {"id": 3, "g": 1, "v": None},
            # group 2: tie between 'a' and 'b' -> smallest ('a') wins
            {"id": 4, "g": 2, "v": "b"}, {"id": 5, "g": 2, "v": "a"},
            {"id": 6, "g": 2, "v": None},
        ]
        out = (impute_group_mode(
            ray_session.data.from_items(rows).repartition(3),
            key_col="g", val_col="v").to_pandas().sort_values("id"))
        assert list(out["v"]) == ["x", "x", "y", "x", "b", "a", "a"]
        assert list(out["was_imputed"]) == [False, False, False, True,
                                            False, False, True]

    def test_group_with_no_observations_keeps_null(self, ray_session):
        from documentai_ray.stages.dq import impute_group_mode
        rows = [{"id": 0, "g": 9, "v": None},
                {"id": 1, "g": 8, "v": "z"}]
        out = (impute_group_mode(ray_session.data.from_items(rows),
                                 key_col="g", val_col="v")
               .to_pandas().sort_values("id"))
        assert out["v"].iloc[0] is None or out["v"].isna().iloc[0]
        assert bool(out["was_imputed"].iloc[0]) is True
