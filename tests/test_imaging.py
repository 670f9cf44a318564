"""minipng codec + real pixel-metric kernel tests (Q1-Q10 on pixels)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from documentai_ray.functions import minipng
from documentai_ray.sources.images import image_dims, image_for, png_payload_for
from documentai_ray.stages import imaging


class TestMinipng:
    def test_roundtrip_random(self):
        rng = np.random.RandomState(7)
        for shape in ((1, 1), (5, 9), (64, 80), (33, 257)):
            img = rng.randint(0, 256, size=shape).astype(np.uint8)
            assert np.array_equal(minipng.decode_gray(minipng.encode_gray(img)), img)

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            minipng.decode_gray(b"not a png")

    def test_deterministic_bytes(self):
        assert png_payload_for(42) == png_payload_for(42)


class TestExactMetrics:
    def test_blank_page(self):
        m = imaging.exact_metrics(image_for(1))  # archetype 1: constant 250
        assert m["brightness"] == 250 / 255
        assert m["contrast"] == 0.0
        assert m["blank_ratio"] == 1.0 and m["dark_ratio"] == 0.0
        assert imaging.image_verdict(m) == "blank"

    def test_stripes_closed_form(self):
        doc_id = 2  # fg=60, bg=220
        m = imaging.exact_metrics(image_for(doc_id))
        fg, bg = 60, 220
        assert m["brightness"] == ((fg + bg) / 2) / 255
        assert m["contrast"] == ((bg - fg) / 2) / 255
        assert m["dark_ratio"] == 0.5  # fg 60 < 64
        assert imaging.image_verdict(m) == "ok"

    def test_low_contrast_verdict(self):
        m = imaging.exact_metrics(image_for(3))
        assert abs(m["contrast"] - 8 / 255) < 1e-12
        assert imaging.image_verdict(m) == "low_contrast"


class TestKernels:
    def test_blur_separates_flat_from_textured(self):
        flat = np.full((64, 64), 128, dtype=np.uint8)
        assert imaging.blur_score(flat) == 0.0
        textured = image_for(0)  # text page: strong line edges
        assert imaging.blur_score(textured) > 1000.0
        assert imaging.sharpness_score(textured) > imaging.sharpness_score(flat)

    def test_noise_estimate_orders(self):
        rng = np.random.RandomState(3)
        clean = np.full((64, 64), 128, dtype=np.uint8)
        noisy = np.clip(clean.astype(int) + rng.normal(0, 20, clean.shape),
                        0, 255).astype(np.uint8)
        assert imaging.noise_mad(noisy) > imaging.noise_mad(clean) + 5

    def test_skew_estimation_recovers_angle(self):
        # horizontal dark lines sheared by a known angle
        h, w = 120, 120
        img = np.full((h, w), 255, dtype=np.uint8)
        angle = 4.0
        for x in range(w):
            shift = int(round(x * math.tan(math.radians(-angle))))
            for r in range(10, h - 15, 20):
                rr = r + shift
                if 0 <= rr < h:
                    img[rr, x] = 0
        est = imaging.estimate_skew(img, max_deg=8, step_deg=1.0)
        assert abs(est - angle) <= 1.0

    def test_edge_margins(self):
        img = np.full((100, 100), 255, dtype=np.uint8)
        img[20:80, 30:90] = 0
        m = imaging.edge_margins(img)
        assert m["top"] == 0.20 and m["left"] == 0.30
        assert m["bottom"] == (100 - 1 - 79) / 100
        blank = np.full((10, 10), 255, dtype=np.uint8)
        assert imaging.edge_margins(blank)["top"] == 1.0


class TestStages:
    def test_quality_stage_error_row(self, ray_session):
        import pyarrow as pa

        st = imaging.ImageQualityStage()
        batch = pa.table({"payload": pa.array(
            [png_payload_for(0), b"garbage"], pa.large_binary())})
        out = st(batch)
        assert out.column("img_verdict").to_pylist()[1] == "error"
        assert out.column("img_error").to_pylist()[0] == ""
        w, h = image_dims(0)
        assert out.column("width").to_pylist()[0] == w
        assert out.column("height").to_pylist()[0] == h

    def test_preprocess_stage_stretch(self):
        import pyarrow as pa

        st = imaging.ImagePreprocessStage(write_back=True)
        batch = pa.table({"payload": pa.array(
            [png_payload_for(3)], pa.large_binary())})  # low contrast
        out = st(batch)
        assert out.column("pp_ops").to_pylist() == [["contrast_stretch"]]
        assert out.column("new_brightness").to_pylist() == [0.5]
        img = minipng.decode_gray(out.column("payload").to_pylist()[0])
        assert set(np.unique(img)) == {0, 255}  # full-range after stretch

    def test_real_decoder_in_multimodal(self):
        from documentai_ray.stages.multimodal import _decode_image_real

        img = _decode_image_real(png_payload_for(5))
        w, h = image_dims(5)
        assert img.shape == (h, w, 1)
        # JPEG/TIFF now dispatch to REAL codecs: malformed bytes are codec
        # errors, not unsupported formats
        with pytest.raises(ValueError):
            _decode_image_real(b"\xff\xd8\xff jpeg-ish")
        with pytest.raises(ValueError):
            _decode_image_real(b"II*\x00 tiff-ish")
        # truly unknown magic remains the native-lib hook
        with pytest.raises(NotImplementedError):
            _decode_image_real(b"BM bitmap-ish")
