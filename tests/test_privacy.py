"""k-anonymity suppression (stages/privacy.py): class-size semantics,
column reshaping, audit path, and block-layout invariance."""

import pyarrow as pa


class TestKAnonymize:
    def test_small_classes_suppressed(self, ray_session):
        from documentai_ray.stages.privacy import k_anonymize
        # class (1, 'A') has 3 rows, class (2, 'B') has 1 row
        rows = [{"id": i, "g": 1, "seg": "A"} for i in range(3)]
        rows.append({"id": 9, "g": 2, "seg": "B"})
        ds = ray_session.data.from_items(rows)
        out = k_anonymize(ds, qi_cols=["g", "seg"], k=2,
                          num_partitions=4).to_pandas()
        by_id = out.set_index("id")
        assert by_id.loc[0, "g_qi"] == "1"
        assert by_id.loc[0, "seg_qi"] == "A"
        assert bool(by_id.loc[0, "k_anonymous"])
        assert by_id.loc[9, "g_qi"] == "*"
        assert by_id.loc[9, "seg_qi"] == "*"
        assert not bool(by_id.loc[9, "k_anonymous"])

    def test_class_counts_span_blocks(self, ray_session):
        """A class split across input blocks must still count as one
        class — co-location comes from the QI-hash exchange, not from
        input layout."""
        from documentai_ray.stages.privacy import k_anonymize
        rows = [{"id": i, "g": 7} for i in range(10)]
        ds = ray_session.data.from_items(rows).repartition(5)
        out = k_anonymize(ds, qi_cols=["g"], k=10,
                          num_partitions=3).to_pandas()
        assert out["k_anonymous"].all()
        assert (out["g_qi"] == "7").all()

    def test_k1_never_suppresses_and_bad_k_raises(self, ray_session):
        from documentai_ray.stages.privacy import k_anonymize
        ds = ray_session.data.from_items([{"id": 1, "g": 5}])
        out = k_anonymize(ds, qi_cols=["g"], k=1).to_pandas()
        assert out["k_anonymous"].all()
        import pytest
        with pytest.raises(ValueError):
            k_anonymize(ds, qi_cols=["g"], k=0)

    def test_non_qi_columns_pass_through(self, ray_session):
        from documentai_ray.stages.privacy import k_anonymize
        ds = ray_session.data.from_items(
            [{"id": i, "g": 1, "payload": f"p{i}"} for i in range(4)])
        out = k_anonymize(ds, qi_cols=["g"], k=2).to_pandas()
        assert sorted(out["payload"]) == ["p0", "p1", "p2", "p3"]
        assert "g" not in out.columns and "g_qi" in out.columns


class TestKAnonymityAudit:
    def test_class_sizes_exact(self, ray_session):
        from documentai_ray.stages.privacy import k_anonymity_audit
        rows = ([{"g": 1, "seg": "A"}] * 5 + [{"g": 1, "seg": "B"}] * 2
                + [{"g": 2, "seg": "A"}] * 3)
        ds = ray_session.data.from_items(rows).repartition(4)
        out = k_anonymity_audit(ds, qi_cols=["g", "seg"], k=3).to_pandas()
        got = {(r["g"], r["seg"]): (r["class_size"], r["k_anonymous"])
               for _, r in out.iterrows()}
        assert got == {(1, "A"): (5, True), (1, "B"): (2, False),
                       (2, "A"): (3, True)}
