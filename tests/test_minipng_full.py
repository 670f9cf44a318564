"""Full-baseline PNG coverage: color types 0/2/3/4/6, bit depths
1/2/4/8/16, Adam7 interlacing, all five filters — the general
:func:`decode_png` read path plus the luma fallback that lets
``decode_gray`` ingest foreign color PNGs. Losslessness is exact, so
every roundtrip asserts pixel equality."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.minipng import (decode_gray, decode_png,
                                              encode_gray, encode_png)


@pytest.mark.parametrize("shape", [(9, 14), (9, 14, 3), (9, 14, 2),
                                   (9, 14, 4)])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [0, 1])
def test_color_filter_interlace_roundtrips(shape, ftype, interlace):
    rng = np.random.RandomState(5)
    src = rng.randint(0, 256, shape).astype(np.uint8)
    back = decode_png(encode_png(src, filter_type=ftype,
                                 interlace=interlace))
    assert np.array_equal(back, src)


@pytest.mark.parametrize("interlace", [0, 1])
def test_palette_roundtrip(interlace):
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (11, 7)).astype(np.uint8)
    p = encode_png(idx, color_type=3, palette=pal, interlace=interlace)
    assert np.array_equal(decode_png(p), pal[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("ftype", [0, 1, 4])
def test_subbyte_gray_roundtrips(depth, ftype):
    rng = np.random.RandomState(7)
    g = rng.randint(0, 1 << depth, (10, 23)).astype(np.uint8)
    for interlace in (0, 1):
        p = encode_png(g, bit_depth=depth, filter_type=ftype,
                       interlace=interlace)
        assert np.array_equal(decode_png(p), g)
    # decode_gray expands sub-byte gray to the full 8-bit range
    step = 255 // ((1 << depth) - 1)
    assert np.array_equal(decode_gray(encode_png(g, bit_depth=depth)),
                          g * step)


def test_16bit_gray_roundtrip():
    rng = np.random.RandomState(8)
    g16 = rng.randint(0, 65536, (6, 9)).astype(np.uint16)
    for ftype in (0, 2, 3):
        back = decode_png(encode_png(g16, bit_depth=16, filter_type=ftype))
        assert back.dtype == np.uint16
        assert np.array_equal(back, g16)
    # luma fallback takes the high byte
    assert np.array_equal(decode_gray(encode_png(g16, bit_depth=16)),
                          (g16 >> 8).astype(np.uint8))


def test_decode_gray_luma_fallback():
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (5, 6, 3)).astype(np.uint8)
    r = rgb[:, :, 0].astype(np.uint32)
    g = rgb[:, :, 1].astype(np.uint32)
    b = rgb[:, :, 2].astype(np.uint32)
    exp = ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
    assert np.array_equal(decode_gray(encode_png(rgb)), exp)
    # alpha is dropped, not composited: RGBA with random alpha → same luma
    rgba = np.dstack([rgb, rng.randint(0, 256, (5, 6)).astype(np.uint8)])
    assert np.array_equal(decode_gray(encode_png(rgba)), exp)


def test_engine_gray8_path_unchanged():
    rng = np.random.RandomState(10)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    assert np.array_equal(decode_gray(encode_gray(img)), img)
    assert np.array_equal(decode_png(encode_gray(img)), img)


@pytest.mark.parametrize("kind", ["rgb", "palette", "adam7", "gray16"])
def test_png_mutation_robustness(kind):
    # corrupt payloads must decode or raise ValueError — never crash
    rng = np.random.RandomState(3)
    if kind == "rgb":
        base = encode_png(rng.randint(0, 256, (12, 9, 3)).astype(np.uint8),
                          filter_type=4)
    elif kind == "palette":
        base = encode_png(rng.randint(0, 8, (10, 10)).astype(np.uint8),
                          color_type=3,
                          palette=rng.randint(0, 256, (8, 3)).astype(
                              np.uint8))
    elif kind == "adam7":
        base = encode_png(rng.randint(0, 256, (12, 9)).astype(np.uint8),
                          interlace=1)
    else:
        base = encode_png(rng.randint(0, 65536, (6, 6)).astype(np.uint16),
                          bit_depth=16)
    for t in range(200):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(8, len(m))]
        try:
            decode_png(bytes(m))
        except ValueError:
            pass


def test_illegal_variants_raise():
    rng = np.random.RandomState(4)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # palette without PLTE
    idx = rng.randint(0, 4, (4, 4)).astype(np.uint8)
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    p = encode_png(idx, color_type=3, palette=pal)
    stripped = p[:8] + b"".join(
        ch for ch in _chunks_of(p) if ch[4:8] != b"PLTE")
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(stripped)


def _chunks_of(p: bytes):
    import struct
    pos = 8
    while pos + 8 <= len(p):
        (ln,) = struct.unpack(">I", p[pos:pos + 4])
        yield p[pos:pos + 12 + ln]
        pos += 12 + ln
