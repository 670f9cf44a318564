"""CCITT Group 4 (ITU-T T.6) codec: spec-anchored bitstream vector,
adversarial roundtrips (all three coding modes, extended makeup runs),
TIFF Compression=4 and PDF /CCITTFaxDecode integration, and the full
scanned-fax composition (G4 PDF → page_images → OCR, byte-identical)."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.faxg4 import (_BLACK_CODES, _WHITE_CODES,
                                            g4_decode, g4_encode)
from documentai_ray.functions.minitiff import (decode_gray_tiff,
                                               encode_gray_tiff)
from documentai_ray.functions.pdfread import page_images
from documentai_ray.functions.pdfwrite import images_to_pdf


def test_spec_table_anchors():
    # published T.4 values: white-0 00110101, white-3 1000, black-0
    # 0000110111, black-1 010, black-2 11, white-makeup-64 11011,
    # shared extended 2560 000000011111
    assert _WHITE_CODES[0] == (8, 0b00110101)
    assert _WHITE_CODES[3] == (4, 0b1000)
    assert _WHITE_CODES[64] == (5, 0b11011)
    assert _BLACK_CODES[0] == (10, 0b0000110111)
    assert _BLACK_CODES[1] == (3, 0b010)
    assert _BLACK_CODES[2] == (2, 0b11)
    assert _WHITE_CODES[2560] == _BLACK_CODES[2560] == (12, 0b000000011111)


def test_hand_derived_bitstream():
    # one line, width 8: white 3, black 2, white 3 → against the
    # all-white reference: H (001) + white-3 (1000) + black-2 (11),
    # then V0 (1) closing at the line end, then EOFB
    row = np.array([[0, 0, 0, 1, 1, 0, 0, 0]], bool)
    assert g4_encode(row).hex() == "31c0040040"
    assert np.array_equal(g4_decode(bytes.fromhex("31c0040040"), 8, 1),
                          row)


def test_adversarial_roundtrips():
    rng = np.random.RandomState(5)
    cases = [np.zeros((5, 9), bool), np.ones((5, 9), bool),
             rng.rand(30, 47) < 0.5, rng.rand(20, 31) < 0.05,
             rng.rand(20, 31) < 0.95,
             np.tile((np.arange(64) % 2).astype(bool), (8, 1))]
    a = np.zeros((7, 13), bool)
    a[3, 6] = True
    cases.append(a)
    base = (np.arange(100) % 7 < 3)
    cases.append(np.array([np.roll(base, i) for i in range(40)]))
    for img in cases:
        assert np.array_equal(
            g4_decode(g4_encode(img), img.shape[1], img.shape[0]), img)


def test_extended_makeup_runs():
    # 2900+ pixel runs need the shared 2560 extended makeup codes
    a = np.zeros((3, 3000), bool)
    a[1, 2900:] = True
    assert np.array_equal(g4_decode(g4_encode(a), 3000, 3), a)
    b = np.ones((2, 3000), bool)
    b[1, :17] = False
    assert np.array_equal(g4_decode(g4_encode(b), 3000, 2), b)


def test_g4_tiff_roundtrip():
    rng = np.random.RandomState(6)
    for h, w in [(1, 1), (7, 13), (40, 65)]:
        src = rng.randint(0, 256, (h, w)).astype(np.uint8)
        want = np.where(src < 128, 0, 255).astype(np.uint8)
        for rps in (None, 5):
            enc = encode_gray_tiff(src, compression="g4",
                                   rows_per_strip=rps)
            assert np.array_equal(decode_gray_tiff(enc), want)


def test_ccittfax_pdf_roundtrip():
    rng = np.random.RandomState(6)
    src = rng.randint(0, 256, (24, 37)).astype(np.uint8)
    want = np.where(src < 128, 0, 255).astype(np.uint8)
    pdf = images_to_pdf([src], image_filter="g4")
    assert b"/CCITTFaxDecode" in pdf and b"/K -1" in pdf
    (got,), = page_images(pdf)
    assert np.array_equal(got, want)


def test_fax_pdf_ocr_byte_identity():
    from documentai_ray.functions.bitfont import CELL_W, GLYPH_H, draw_text
    from documentai_ray.functions.pdfwrite import wrap_text_lines
    from documentai_ray.stages.ocr import ocr_image

    src = ("the quick brown fox jumps over the lazy dog " * 3).strip()
    lines = wrap_text_lines(src)
    w = max(len(ln) for ln in lines) * CELL_W + 8
    h = len(lines) * (GLYPH_H + 3) + 8
    page = np.full((h, w), 255, np.uint8)
    for i, ln in enumerate(lines):
        draw_text(page, 4, 4 + i * (GLYPH_H + 3), ln)
    (scan,), = page_images(images_to_pdf([page], image_filter="g4"))
    text, _boxes = ocr_image(scan)
    assert text == "\n".join(lines)


@pytest.mark.parametrize("container", ["tiff", "pdf"])
def test_g4_mutation_robustness(container):
    rng = np.random.RandomState(3)
    src = rng.randint(0, 256, (20, 30)).astype(np.uint8)
    if container == "tiff":
        base = encode_gray_tiff(src, compression="g4", rows_per_strip=4)
        decode = decode_gray_tiff
    else:
        base = images_to_pdf([src], image_filter="g4")
        decode = page_images
    for t in range(200):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(4, len(m))]
        try:
            decode(bytes(m))
        except ValueError:
            pass


def test_g3_roundtrip_k0_and_k4():
    from documentai_ray.functions.faxg4 import g3_decode, g3_encode
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (5, 7), (40, 101), (64, 64)]:
        img = rng.rand(*shape) < 0.3
        for k in (0, 1, 2, 4):
            enc = g3_encode(img, k)
            assert np.array_equal(g3_decode(enc, shape[1], shape[0], k),
                                  img), (shape, k)
    # structured content (long runs exercise makeup codes)
    img = np.zeros((30, 3000), bool)
    img[5:10, 10:2900] = True
    img[20, :] = True
    for k in (0, 4):
        assert np.array_equal(
            g3_decode(g3_encode(img, k), 3000, 30, k), img)


def test_g3_no_eol_and_byte_align_paths():
    from documentai_ray.functions.faxg4 import (_BitW, _decode_1d_line,
                                                _encode_1d_line, g3_decode)
    rng = np.random.RandomState(11)
    img = rng.rand(9, 33) < 0.4
    # /EndOfLine false: consecutive bit-packed 1-D lines, no framing
    bw = _BitW()
    for y in range(9):
        _encode_1d_line(bw, img[y], 33)
    assert np.array_equal(g3_decode(bw.done(), 33, 9, k=0, eol=False), img)
    # /EncodedByteAlign: each line starts on a byte boundary
    bw = _BitW()
    for y in range(9):
        _encode_1d_line(bw, img[y], 33)
        bw.done()  # flush pads to the byte boundary, buf is reused
    data = bytes(bw.buf)
    assert np.array_equal(
        g3_decode(data, 33, 9, k=0, eol=False, byte_align=True), img)


def test_g3_k_positive_requires_eol():
    from documentai_ray.functions.faxg4 import g3_decode
    with pytest.raises(ValueError, match="EOL"):
        g3_decode(b"\x00", 8, 8, k=4, eol=False)


def test_g3_pdf_roundtrip_both_modes():
    src = np.full((12, 40), 255, np.uint8)
    src[3:6, 5:30] = 0
    src[9, ::3] = 0
    for filt in ("g3", "g3_2d"):
        pdf = images_to_pdf([src], image_filter=filt)
        (page,), = page_images(pdf)
        assert page.shape == src.shape
        # bilevel: ink positions survive exactly
        assert np.array_equal(page < 128, src < 128)


def test_g3_mutation_robustness():
    from documentai_ray.functions.faxg4 import g3_decode, g3_encode
    rng = np.random.RandomState(5)
    img = rng.rand(16, 24) < 0.35
    base = g3_encode(img, 4)
    for t in range(200):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(1, len(m))]
        try:
            g3_decode(bytes(m), 24, 16, 4)
        except ValueError:
            pass
