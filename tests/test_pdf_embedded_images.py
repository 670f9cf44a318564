"""Embedded-image PDFs: page_images decodes XObjects through the
standard filter chains (FlateDecode lossless) and as real embedded JPEG
(`/DCTDecode` → the general T.81 decoder) — the scanner/img2pdf layout
real PDFs actually use."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.pdfread import page_images
from documentai_ray.functions.pdfwrite import images_to_pdf, validate


def _imgs():
    rng = np.random.RandomState(4)
    return [rng.randint(0, 256, (24, 32)).astype(np.uint8),
            ((np.arange(16)[:, None] + np.arange(20)) % 256).astype(
                np.uint8)]


@pytest.mark.parametrize("filt", ["none", "flate"])
def test_lossless_embeds_roundtrip_exactly(filt):
    imgs = _imgs()
    back = page_images(images_to_pdf(imgs, image_filter=filt))
    assert [len(p) for p in back] == [1, 1]
    for src, (got,) in zip(imgs, back):
        assert np.array_equal(got, src)


def test_dct_embed_constant_is_exact():
    const = np.full((16, 24), 90, np.uint8)  # even offset → DC-exact
    (got,), = page_images(images_to_pdf([const], image_filter="dct"))
    assert np.array_equal(got, const)


def test_dct_embed_smooth_quality():
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = (128 + 60 * np.sin(yy / 9.0)
              + 50 * np.cos(xx / 11.0)).clip(0, 255).astype(np.uint8)
    (got,), = page_images(images_to_pdf([smooth], image_filter="dct"))
    mse = np.mean((got.astype(float) - smooth.astype(float)) ** 2)
    assert 10 * np.log10(255.0 ** 2 / mse) > 35


def test_raw_writer_still_validates():
    validate(images_to_pdf(_imgs()))


def test_bad_image_codec_payloads_raise():
    # /JPXDecode now decodes - but raw (non-J2K) bytes behind the
    # filter must raise a clear error, not silently mis-decode
    pdf = images_to_pdf([np.full((8, 8), 5, np.uint8)])
    bad = pdf.replace(b"/BitsPerComponent 8",
                      b"/Filter /JPXDecode /BitsPerComponent 8")
    with pytest.raises(ValueError, match="J2K"):
        page_images(bad)
    # an unknown filter name still raises in the filter chain
    bad2 = pdf.replace(b"/BitsPerComponent 8",
                       b"/Filter /BogusDecode /BitsPerComponent 8")
    with pytest.raises(ValueError, match="unsupported PDF filter"):
        page_images(bad2)


def test_mutation_robustness_embedded():
    rng = np.random.RandomState(3)
    base = images_to_pdf(_imgs(), image_filter="dct")
    for t in range(150):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(8, len(m))]
        try:
            page_images(bytes(m))
        except ValueError:
            pass


def test_scanned_pdf_ocr_byte_identity():
    # the reference's pdf2image+tesseract loop composed in-engine:
    # text → bitfont page scan → Flate-embedded PDF → page_images → OCR
    from documentai_ray.functions.bitfont import CELL_W, GLYPH_H, draw_text
    from documentai_ray.functions.pdfwrite import wrap_text_lines
    from documentai_ray.stages.ocr import ocr_image

    src = ("the quick brown fox jumps over the lazy dog " * 5).strip()
    lines = wrap_text_lines(src)
    w = max(len(ln) for ln in lines) * CELL_W + 8
    h = len(lines) * (GLYPH_H + 3) + 8
    page = np.full((h, w), 255, np.uint8)
    for i, ln in enumerate(lines):
        draw_text(page, 4, 4 + i * (GLYPH_H + 3), ln)
    pdf = images_to_pdf([page], image_filter="flate")
    (scan,), = page_images(pdf)
    text, boxes = ocr_image(scan)
    assert text == "\n".join(lines)
    assert len(boxes) == len(src.split())


def test_lossy_dct_scan_ocr_byte_identity():
    # the LOSSY scanned-PDF loop: bitfont page → real JPEG (DCTDecode)
    # → decode → OCR; binarization + the Hamming-tolerant glyph matcher
    # absorb the quantization noise, so the text is still byte-exact
    from documentai_ray.functions.bitfont import CELL_W, GLYPH_H, draw_text
    from documentai_ray.functions.pdfwrite import wrap_text_lines
    from documentai_ray.stages.ocr import ocr_image

    src = ("the quick brown fox jumps over the lazy dog 0123456789 "
           * 4).strip()
    lines = wrap_text_lines(src)
    w = max(len(ln) for ln in lines) * CELL_W + 8
    h = len(lines) * (GLYPH_H + 3) + 8
    page = np.full((h, w), 255, np.uint8)
    for i, ln in enumerate(lines):
        draw_text(page, 4, 4 + i * (GLYPH_H + 3), ln)
    (scan,), = page_images(images_to_pdf([page], image_filter="dct"))
    text, _boxes = ocr_image(scan)
    assert text == "\n".join(lines)


def test_match_glyph_hamming_tolerance():
    from documentai_ray.functions.bitfont import (CHARS, GLYPH_H, GLYPH_W,
                                                  GLYPHS, match_glyph)

    rng = np.random.RandomState(4)
    for ch in CHARS:
        assert match_glyph(GLYPHS[ch]) == ch  # exact path unchanged
        g = GLYPHS[ch].copy()
        for _ in range(3):
            gg = g.copy()
            for _f in range(rng.randint(1, 4)):
                r, c = rng.randint(GLYPH_H), rng.randint(GLYPH_W)
                gg[r, c] = ~gg[r, c]
            assert match_glyph(gg) == ch
    # far-off patterns still refuse (no overeager matching)
    assert match_glyph(np.zeros((GLYPH_H, GLYPH_W), bool)) is None
