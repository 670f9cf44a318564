"""Real OCR path: bitfont render → PNG → matched-template recognition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _render(text: str) -> np.ndarray:
    from documentai_ray.functions.minipdf import build_from_text
    from documentai_ray.functions.raster import rasterize_first_page

    payload, _ = build_from_text(text, shuffle_key=5)
    return rasterize_first_page(payload, glyphs=True)


def test_bitfont_unique_and_roundtrip_cell():
    from documentai_ray.functions.bitfont import (GLYPHS, draw_text,
                                                  match_glyph)

    assert len(GLYPHS) == 94
    img = np.full((9, 20), 255, np.uint8)
    draw_text(img, 1, 1, "A)")
    assert match_glyph(img[1:8, 1:6] < 128) == "A"
    assert match_glyph(img[1:8, 7:12] < 128) == ")"


def test_ocr_recovers_walk_text_byte_identical():
    from documentai_ray.functions.minipdf import build_from_text
    from documentai_ray.stages.ocr import ocr_image

    text = ("alpha beta gamma delta epsilon zeta eta theta "
            "iota kappa lam mu nu xi omicron pi "
            "rho sigma tau upsilon phi chi psi omega")
    payload, expected = build_from_text(text, shuffle_key=5)
    got, boxes = ocr_image(_render(text))
    # 24 words = 3 lines = 1 block page -> first page holds everything
    assert got == expected
    assert [b["text"] for b in boxes][:8] == text.split()[:8]


def test_ocr_mixed_charset_and_punctuation():
    from documentai_ray.stages.ocr import ocr_image

    text = "PO-10042 DATED: 03.03.2024 USD 125,000.00 (NET)"
    got, _ = ocr_image(_render(text))
    assert got.replace("\n", " ") == text


def test_ocr_stage_full_chain(ray_session):
    from documentai_ray.functions import minipng
    from documentai_ray.stages.ocr import OcrStage

    img = _render("hello world again")
    batch = pa.table({"url": ["u"],
                      "png": pa.array([minipng.encode_gray(img)],
                                      pa.large_binary())})
    out = OcrStage()(batch)
    assert out.column("ocr_text").to_pylist() == ["hello world again"]
    boxes = out.column("ocr_boxes").to_pylist()[0]
    assert [b["text"] for b in boxes] == ["hello", "world", "again"]
    assert boxes[0]["page"] == 1 and boxes[0]["x1"] > boxes[0]["x0"]


def test_layout_analysis_structure():
    from documentai_ray.stages.ocr import layout_analysis

    # 25 words -> 4 lines of 8/8/8/1 -> blocks of 3+1 lines
    text = " ".join(f"w{i}" for i in range(25))
    lay = layout_analysis(_render(text))
    assert lay["n_words"] == 25
    assert lay["n_lines"] == 4
    assert lay["n_blocks"] == 2
    assert lay["blocks"][0]["n_lines"] == 3
    assert lay["blocks"][1]["n_lines"] == 1
