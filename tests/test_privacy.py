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


class TestLDiversity:
    def test_homogeneous_class_suppressed_even_when_large(self,
                                                          ray_session):
        """The k-anonymity blind spot: a class of 8 rows all sharing
        the sensitive value is k-anonymous at k=8 yet leaks — l=2
        suppresses it; a size-3 mixed class passes."""
        from documentai_ray.stages.privacy import l_diversify
        rows = ([{"id": i, "g": 1, "s": "x"} for i in range(8)]
                + [{"id": 8, "g": 2, "s": "x"},
                   {"id": 9, "g": 2, "s": "y"},
                   {"id": 10, "g": 2, "s": "x"}])
        ds = ray_session.data.from_items(rows).repartition(3)
        out = (l_diversify(ds, qi_cols=["g"], sensitive_col="s", l=2)
               .to_pandas().sort_values("id"))
        assert list(out["l_diverse"]) == [False] * 8 + [True] * 3
        assert set(out["g_qi"][:8]) == {"*"}
        assert set(out["g_qi"][8:]) == {"2"}
        # sensitive column itself passes through unsuppressed
        assert list(out["s"]) == ["x"] * 8 + ["x", "y", "x"]

    def test_cross_block_distinct_counting(self, ray_session):
        """A class whose two sensitive values live in different input
        blocks still counts as diverse (co-location by QI hash)."""
        from documentai_ray.stages.privacy import l_diversify
        rows = [{"id": 0, "g": 7, "s": "a"}, {"id": 1, "g": 7, "s": "b"}]
        ds = ray_session.data.from_items(rows).repartition(2)
        out = l_diversify(ds, qi_cols=["g"], sensitive_col="s",
                          l=2).to_pandas()
        assert list(out["l_diverse"]) == [True, True]

    def test_rejects_bad_l(self, ray_session):
        import pytest
        from documentai_ray.stages.privacy import l_diversify
        with pytest.raises(ValueError):
            l_diversify(ray_session.data.from_items([{"g": 1, "s": 1}]),
                        qi_cols=["g"], sensitive_col="s", l=0)


class TestLDiversityAudit:
    def test_audit_counts_exact(self, ray_session):
        from documentai_ray.stages.privacy import l_diversity_audit
        rows = ([{"g": 1, "s": "a"}] * 4 + [{"g": 1, "s": "b"}]
                + [{"g": 2, "s": "a"}] * 3)
        ds = ray_session.data.from_items(rows).repartition(4)
        out = l_diversity_audit(ds, qi_cols=["g"], sensitive_col="s",
                                l=2).to_pandas()
        got = {r["g"]: (r["class_size"], r["l_distinct"], r["l_diverse"])
               for _, r in out.iterrows()}
        assert got == {1: (5, 2, True), 2: (3, 1, False)}
