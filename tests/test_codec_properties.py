"""Property-based (hypothesis) coverage of the round-3 codec surface:
arbitrary inputs must round-trip exactly through every lossless codec —
LZW, PackBits, G4, PNG (all color types), AES-CBC, the TIFF container,
and modern/encrypted PDF text extraction."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from documentai_ray.functions.faxg4 import g4_decode, g4_encode
from documentai_ray.functions.minitiff import (decode_gray_tiff,
                                               encode_gray_tiff,
                                               lzw_decode, lzw_encode,
                                               packbits_decode,
                                               packbits_encode)

_BYTES = st.binary(min_size=0, max_size=3000)


@given(_BYTES)
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_any_bytes(data):
    assert lzw_decode(lzw_encode(data)) == data
    assert lzw_decode(lzw_encode(data), len(data)) == data


@given(_BYTES)
@settings(max_examples=60, deadline=None)
def test_packbits_roundtrip_any_bytes(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data


@st.composite
def _gray_images(draw, max_h=24, max_w=40):
    h = draw(st.integers(1, max_h))
    w = draw(st.integers(1, max_w))
    flat = draw(st.binary(min_size=h * w, max_size=h * w))
    return np.frombuffer(flat, np.uint8).reshape(h, w).copy()


@given(_gray_images(), st.sampled_from(["none", "packbits", "lzw"]),
       st.integers(1, 7))
@settings(max_examples=40, deadline=None)
def test_tiff_container_roundtrip(img, comp, rps):
    enc = encode_gray_tiff(img, compression=comp, rows_per_strip=rps)
    assert np.array_equal(decode_gray_tiff(enc), img)


@given(_gray_images(max_h=20, max_w=40))
@settings(max_examples=30, deadline=None)
def test_g4_roundtrip_any_bitmap(img):
    bits = img >= 128
    assert np.array_equal(g4_decode(g4_encode(bits), bits.shape[1],
                                    bits.shape[0]), bits)


@given(_gray_images(max_h=16, max_w=24),
       st.sampled_from([0, 1, 2, 3, 4]), st.booleans())
@settings(max_examples=30, deadline=None)
def test_png_gray_roundtrip(img, ftype, interlace):
    from documentai_ray.functions.minipng import decode_png, encode_png

    enc = encode_png(img, filter_type=ftype, interlace=int(interlace))
    assert np.array_equal(decode_png(enc), img)


@given(st.binary(min_size=16, max_size=16),
       st.binary(min_size=16, max_size=16), _BYTES)
@settings(max_examples=40, deadline=None)
def test_aes_cbc_roundtrip(key, iv, data):
    from documentai_ray.functions.aes import cbc_decrypt, cbc_encrypt

    assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, data)) == data


_WORD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=8)


@given(st.lists(_WORD, min_size=0, max_size=40),
       st.sampled_from(["lzw", "a85flate", "hexflate", "rl"]),
       st.integers(0, 7))
@settings(max_examples=25, deadline=None)
def test_modern_pdf_text_roundtrip(words, filt, key):
    from documentai_ray.functions.pdfread import extract_text
    from documentai_ray.functions.pdfwrite import (text_to_pdf,
                                                   text_to_pdf_modern)

    lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    want = extract_text(text_to_pdf(lines, shuffle_key=key))[0]
    got = extract_text(text_to_pdf_modern(lines, shuffle_key=key,
                                          content_filter=filt))[0]
    assert got == want


@given(st.lists(_WORD, min_size=0, max_size=32), st.booleans())
@settings(max_examples=20, deadline=None)
def test_encrypted_pdf_text_roundtrip(words, aes):
    from documentai_ray.functions.pdfread import extract_text
    from documentai_ray.functions.pdfwrite import encrypt_pdf, text_to_pdf

    lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    plain = text_to_pdf(lines, compress=True)
    assert extract_text(encrypt_pdf(plain, aes=aes))[0] == \
        extract_text(plain)[0]


@given(st.lists(_WORD, min_size=0, max_size=24),
       st.sampled_from(["rc4", "aesv2", "aesv3"]))
@settings(max_examples=15, deadline=None)
def test_encrypted_pdf_all_modes_roundtrip(words, mode):
    from documentai_ray.functions.pdfread import extract_text
    from documentai_ray.functions.pdfwrite import encrypt_pdf, text_to_pdf

    lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    plain = text_to_pdf(lines, compress=True)
    enc = encrypt_pdf(plain, aes=(mode == "aesv2"),
                      aes256=(mode == "aesv3"))
    assert extract_text(enc)[0] == extract_text(plain)[0]


@given(_gray_images(max_h=20, max_w=40), st.integers(1, 9))
@settings(max_examples=25, deadline=None)
def test_g4_tiff_container_any_strips(img, rps):
    want = np.where(img < 128, 0, 255).astype(np.uint8)
    enc = encode_gray_tiff(img, compression="g4", rows_per_strip=rps)
    assert np.array_equal(decode_gray_tiff(enc), want)


@given(_gray_images(max_h=16, max_w=24),
       st.sampled_from(["png", "png-rgb", "jpeg-prog", "tiff-lzw",
                        "tiff-g4"]))
@settings(max_examples=25, deadline=None)
def test_image_dispatch_any_format(img, fmt):
    from documentai_ray.functions.jpegdec import encode_jpeg
    from documentai_ray.functions.minipng import encode_png
    from documentai_ray.stages.multimodal import _decode_image_real

    if fmt == "png":
        payload = encode_png(img)
    elif fmt == "png-rgb":
        payload = encode_png(np.dstack([img, img, img]))
    elif fmt == "jpeg-prog":
        payload = encode_jpeg(img, progressive=True)
    elif fmt == "tiff-lzw":
        payload = encode_gray_tiff(img, compression="lzw")
    else:
        payload = encode_gray_tiff(img, compression="g4")
    out = _decode_image_real(payload)
    assert out.shape == (img.shape[0], img.shape[1], 1)
    assert out.dtype == np.uint8
