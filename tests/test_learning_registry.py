"""Auto-learning accumulator (T6), extractor registry (§2.11), quality
config surface."""

from __future__ import annotations

from documentai_ray.state.learning import LearningAccumulator
from documentai_ray.stages import entities
from documentai_ray.stages.quality import load_quality_config, recommendation_for


class TestLearningAccumulator:
    def test_filters_and_threshold(self):
        acc = LearningAccumulator(retrain_threshold=3)
        texts = ["x" * 30, "short", "y" * 30, "z" * 30, "w" * 30]
        cats = ["a", "a", "unclassified", "b", "a"]
        confs = [0.9, 0.9, 0.9, 0.5, 0.8]
        accepted = acc.add_samples(texts, cats, confs)
        # kept: (x,a,.9) and (w,a,.8); rejected: short text, unclassified, low conf
        assert accepted == 2
        assert acc.counts() == {"accepted": 2, "rejected": 3, "retrains": 0}
        assert acc.maybe_retrain() is None  # below threshold

    def test_retrain_drains_and_returns_model(self):
        acc = LearningAccumulator(retrain_threshold=4)
        acc.add_samples(["spark table join data merge" * 3] * 2, ["data_report"] * 2, [0.9] * 2)
        acc.add_samples(["PO NUMBER: PO-1 SELLER: X BUYER: Y ok"] * 2,
                        ["purchase_order"] * 2, [0.9] * 2)
        model = acc.maybe_retrain()
        assert model is not None
        assert sorted(str(c) for c in model["classes"]) == ["data_report", "purchase_order"]
        assert acc.counts()["accepted"] == 0 and acc.counts()["retrains"] == 1

    def test_named_actor_round_trip(self, ray_session):
        import ray

        acc = ray.remote(LearningAccumulator).options(
            name="learning-accumulator-test", get_if_exists=True).remote()
        n = ray.get(acc.add_samples.remote(["long enough sample text here"],
                                           ["cat"], [0.95]))
        assert n == 1
        assert ray.get(acc.counts.remote())["accepted"] == 1
        ray.kill(acc)

    def test_offline_table_drain(self):
        acc = LearningAccumulator()
        acc.add_samples(["sample text long enough ok"], ["a"], [0.9])
        t = acc.samples_to_table()
        assert t.num_rows == 1 and acc.counts()["accepted"] == 0
        assert t.column("category").to_pylist() == ["a"]


class TestExtractorRegistry:
    def test_register_and_dispatch(self):
        def fake(text):
            return {"seller": "CUSTOM"}

        entities.register_extractor("custom_cat", fake)
        try:
            assert entities.get_extractor("custom_cat") is fake
            import pyarrow as pa

            batch = pa.table({
                "text": pa.array(["anything"], pa.large_string()),
                "category": ["custom_cat"],
            })
            out = entities.entities_batch(batch)
            assert out.column("seller").to_pylist() == ["CUSTOM"]
        finally:
            del entities.EXTRACTORS["custom_cat"]

    def test_default_po_registered(self):
        assert entities.get_extractor("purchase_order") is entities.extract_po
        assert entities.get_extractor("nope") is None


class TestQualityConfigSurface:
    def test_yaml_loaded(self):
        cfg = load_quality_config()
        assert cfg["verdicts"]["direct_analysis"] == 0.95
        assert cfg["weights"]["length"] == 0.4

    def test_recommendations(self):
        assert "blank" in recommendation_for("re_scan")
        assert recommendation_for("unknown_verdict") == ""
