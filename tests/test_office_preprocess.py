"""DOCX/XLSX readers (S4/S5), preprocessing decision/ops (M14-M16), page
grouping (A4), page-type detection (M5), input caps (O2)."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.sources import office
from documentai_ray.stages import preprocess
from documentai_ray.stages.extract import detect_page_type, extract_one


class TestOfficeReaders:
    def test_docx_roundtrip(self):
        payload = office.make_docx(["First paragraph here.", "Second paragraph."])
        assert office.office_kind(payload) == "docx"
        assert office.read_docx_text(payload) == "First paragraph here.\nSecond paragraph."

    def test_xlsx_roundtrip(self):
        payload = office.make_xlsx([["name", "qty"], ["steel", "500"]])
        assert office.office_kind(payload) == "xlsx"
        assert office.read_xlsx_text(payload) == "name qty\nsteel 500"

    def test_xlsx_row_cap(self):
        payload = office.make_xlsx([[f"row{i}"] for i in range(200)])
        text = office.read_xlsx_text(payload, max_rows=100)
        assert len(text.split("\n")) == 100

    def test_xlsx_char_cap(self):
        payload = office.make_xlsx([["x" * 400] for _ in range(10)])
        text = office.read_xlsx_text(payload, max_chars=1000)
        assert len(text) <= 1100  # cap + at most one partial line

    def test_extract_one_dispatches_office(self):
        t, kind, err, _ = extract_one(office.make_docx(["Body text of the doc."]))
        assert (t, kind, err) == ("Body text of the doc.", "docx", "")
        t, kind, err, _ = extract_one(office.make_xlsx([["a", "b"]]))
        assert (t, kind, err) == ("a b", "xlsx", "")

    def test_non_office_zip_is_error_row(self):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("random.txt", "hi")
        t, kind, err, _ = extract_one(buf.getvalue())
        assert kind == "error"  # zip that is neither docx nor xlsx nor utf8-html


class TestInputCaps:
    def test_oversized_payload_is_error_row(self):
        t, kind, err, _ = extract_one(b"<html></html>" * 10, max_bytes=50)
        assert t == "" and kind == "error" and "PayloadTooLarge" in err


class TestPageTypeDetection:
    def test_thresholds(self):
        assert detect_page_type(word_count=20) == "text"
        assert detect_page_type(word_count=3, image_count=2) == "image"
        assert detect_page_type(word_count=10, image_count=0, text_density=0.2) == "text"
        assert detect_page_type(word_count=10, image_count=0, text_density=0.01) == "image"


class TestPreprocessDecision:
    def test_decision_matrix(self):
        d = preprocess.preprocess_decision("pre_processing")
        assert d["needs_preprocessing"] and d["priority"] == "normal"
        assert preprocess.preprocess_decision("direct_analysis") == {
            "needs_preprocessing": False, "operations": [], "priority": "none"}
        assert preprocess.preprocess_decision("re_scan")["priority"] == "reject"

    def test_decision_batch(self):
        import pyarrow as pa

        t = pa.table({"verdict": ["direct_analysis", "deep_analysis"]})
        out = preprocess.decision_batch(t)
        assert out.column("needs_preprocessing").to_pylist() == [False, True]
        assert out.column("pp_operations").to_pylist()[1] == [
            "contrast_stretch", "black_point", "brightness"]


class TestAdaptivePreprocess:
    def test_low_contrast_stretched(self):
        rng = np.random.RandomState(0)
        img = (rng.randint(118, 138, size=(64, 64))).astype(np.uint8)  # flat
        out, applied = preprocess.adaptive_preprocess(img)
        assert "contrast_stretch" in applied
        assert out.std() > img.std()

    def test_good_image_untouched(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
        out, applied = preprocess.adaptive_preprocess(img)
        assert applied == [] and (out == img).all()

    def test_ops_pure(self):
        img = np.full((8, 8), 50, dtype=np.uint8)
        assert preprocess.black_point_clamp(img, 70).max() == 0
        assert preprocess.brightness_boost(img).mean() > img.mean()

    def test_clahe_equalizes_low_contrast_gradient(self):
        grad = np.clip(np.tile(np.linspace(110, 146, 64), (64, 1)),
                       0, 255).astype(np.uint8)
        out = preprocess.clahe(grad, clip_limit=40.0)
        assert out.shape == grad.shape and out.dtype == np.uint8
        assert out.std() > grad.std() * 1.5  # local contrast raised

    def test_clahe_heavy_clipping_near_identity(self):
        # clip_limit=2 on a 2-level image flattens the histogram toward
        # uniform → mapping ≈ identity (the contract of the clip limit)
        img = np.empty((64, 64), dtype=np.uint8)
        img[:, :32] = 120
        img[:, 32:] = 136
        out = preprocess.clahe(img, clip_limit=2.0)
        assert abs(float(out.std()) - float(img.std())) < 2.0

    def test_deskew_levels_sheared_lines(self):
        import math

        from documentai_ray.stages.imaging import estimate_skew

        h, w = 120, 120
        for ang in (2.0, 4.0, -3.0):
            sk = np.full((h, w), 255, np.uint8)
            for x in range(w):
                s = int(round(x * math.tan(math.radians(-ang))))
                for r in range(10, h - 15, 20):
                    rr = r + s
                    if 0 <= rr < h:
                        sk[rr, x] = 0
            assert abs(estimate_skew(sk) - ang) <= 1.0
            assert abs(estimate_skew(preprocess.deskew(sk))) <= 0.5


class TestPageGrouping:
    def test_consecutive_grouping(self):
        cats = ["a", "a", "b", "b", "b", "a"]
        assert preprocess.group_pages(cats) == [0, 0, 1, 1, 1, 2]

    def test_cap(self):
        assert preprocess.group_pages(["a"] * 5, max_pages_per_group=2) == [
            0, 0, 1, 1, 2]

    def test_always_separate(self):
        got = preprocess.group_pages(["a", "a", "po", "po"],
                                     always_separate=("po",))
        assert got == [0, 0, 1, 2]
