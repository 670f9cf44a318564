"""Classification technique + vote-fusion tests (M8-M13 parity)."""

from __future__ import annotations

import pyarrow as pa

from documentai_ray.sources.pages import po_lines
from documentai_ray.stages import classify


CFG = classify.load_config()
PO_TEXT = "\n".join(po_lines(1234))
REPORT_TEXT = "spark query merge join the table column row data filter sort"


class TestTechniques:
    def test_keyword_po(self):
        c = classify.KeywordClassifier(CFG)
        assert c.classify(PO_TEXT) == ("purchase_order", 0.8)

    def test_keyword_report(self):
        c = classify.KeywordClassifier(CFG)
        assert c.classify(REPORT_TEXT) == ("data_report", 0.8)

    def test_keyword_miss(self):
        c = classify.KeywordClassifier(CFG)
        assert c.classify("zzz yyy xxx") == (classify.UNCLASSIFIED, 0.1)
        assert c.classify("") == (classify.UNCLASSIFIED, 0.1)

    def test_regex_po(self):
        c = classify.RegexClassifier(CFG)
        cat, conf = c.classify(PO_TEXT)
        assert cat == "purchase_order" and 0 < conf <= 1

    def test_tokenset(self):
        c = classify.TokenSetClassifier(CFG)
        assert c.classify(PO_TEXT)[0] == "purchase_order"
        assert c.classify(REPORT_TEXT) == ("data_report", 0.7)

    def test_ml_scorer(self):
        m = classify.MLScorer()
        assert m.predict_one(PO_TEXT)[0] == "purchase_order"
        assert m.predict_one(REPORT_TEXT)[0] == "data_report"
        assert m.predict_one("")[0] == classify.UNCLASSIFIED

    def test_ml_batch_predict_matches_single(self):
        m = classify.MLScorer()
        t = pa.table({"text": pa.array([PO_TEXT, REPORT_TEXT, ""], pa.large_string())})
        out = m(t)
        assert out.column("tech_ml").to_pylist() == [
            "purchase_order", "data_report", classify.UNCLASSIFIED
        ]


class TestVoteFusion:
    def _batch(self, techs, confs):
        cols = {}
        names = ["tech_keyword", "tech_regex", "tech_tokenset", "tech_ml"]
        for n, v in zip(names, techs):
            cols[n] = [v]
        for n, v in zip([f"{n}_conf" for n in names], confs):
            cols[n] = [v]
        return pa.table(cols)

    def test_unanimous(self):
        out = classify.fuse_votes(self._batch(["a"] * 4, [0.8] * 4))
        assert out.column("category").to_pylist() == ["a"]
        assert out.column("votes").to_pylist() == ["4/4"]

    def test_majority(self):
        out = classify.fuse_votes(self._batch(["a", "a", "a", "b"], [0.8] * 4))
        assert out.column("category").to_pylist() == ["a"]
        assert out.column("votes").to_pylist() == ["3/4"]

    def test_tie_breaks_by_confidence_then_name(self):
        out = classify.fuse_votes(self._batch(["a", "a", "b", "b"], [0.9, 0.9, 0.1, 0.1]))
        assert out.column("category").to_pylist() == ["a"]
        out = classify.fuse_votes(self._batch(["b", "b", "a", "a"], [0.5, 0.5, 0.5, 0.5]))
        assert out.column("category").to_pylist() == ["a"]  # name asc on full tie

    def test_three_technique_stage(self):
        stage = classify.ThreeTechniqueStage()
        t = pa.table({"text": pa.array([PO_TEXT, ""], pa.large_string())})
        out = stage(t)
        assert out.column("tech_keyword").to_pylist() == [
            "purchase_order", classify.UNCLASSIFIED
        ]
        assert out.column("tech_regex").to_pylist()[0] == "purchase_order"
        assert out.column("tech_tokenset").to_pylist()[0] == "purchase_order"


class TestFusedStageEquivalence:
    def test_fused_equals_unfused_chain(self):
        from documentai_ray.sources.pages import pages_dataset  # noqa: F401
        from documentai_ray.sources import pages as pg
        from documentai_ray.stages.extract import extract_batch

        t = pg.synth_pages_table("/root/testdata/sf0.001", with_dups=False)
        extracted = extract_batch(t)
        fused = classify.ClassifyStage()(extracted)
        chain = classify.fuse_votes(classify.MLScorer()(classify.ThreeTechniqueStage()(extracted)))
        for col in ["tech_keyword", "tech_regex", "tech_tokenset", "tech_ml",
                    "category", "votes", "tech_keyword_conf", "tech_regex_conf",
                    "tech_tokenset_conf", "tech_ml_conf"]:
            assert fused.column(col).to_pylist() == chain.column(col).to_pylist(), col
