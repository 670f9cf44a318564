"""General T.81 JPEG decoder coverage (functions/jpegdec.py): DHT-driven
Huffman tables, color with 4:4:4 / 4:2:0 subsampling, restart intervals,
and progressive SOF2 with successive approximation + EOB runs. The
sharpest invariant: progressive scans are a reordering of the SAME
quantized coefficients, so progressive decode must equal sequential
decode BIT-FOR-BIT on every image."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.jpegdec import decode_jpeg, encode_jpeg
from documentai_ray.functions.minijpeg import (decode_gray_jpeg,
                                               encode_gray_jpeg)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _smooth_gray(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return (128 + 60 * np.sin(yy / 9.0)
            + 50 * np.cos(xx / 11.0)).clip(0, 255).astype(np.uint8)


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack([(128 + 70 * np.sin(yy / 7.0)).clip(0, 255),
                      (128 + 70 * np.cos(xx / 9.0)).clip(0, 255),
                      (yy * 3 + xx * 2) % 256]).astype(np.uint8)


def test_engine_gray_stream_decodes_identically():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (24, 33)).astype(np.uint8)
    pay = encode_gray_jpeg(img)
    assert np.array_equal(decode_jpeg(pay), decode_gray_jpeg(pay))


@pytest.mark.parametrize("dri", [0, 2, 5])
def test_gray_sequential_quality(dri):
    src = _smooth_gray(40, 56)
    out = decode_jpeg(encode_jpeg(src, restart_interval=dri))
    assert out.shape == src.shape
    assert _psnr(src, out) > 35


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dri", [0, 3])
def test_color_sequential_quality(sub, dri):
    src = _smooth_rgb(41, 55)
    out = decode_jpeg(encode_jpeg(src, subsampling=sub,
                                  restart_interval=dri))
    assert out.shape == src.shape
    assert _psnr(src, out) > (30 if sub == "420" else 33)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_equals_sequential_color(sub):
    src = _smooth_rgb(41, 55)
    seq = decode_jpeg(encode_jpeg(src, subsampling=sub))
    for dri in (0, 2):
        prog = decode_jpeg(encode_jpeg(src, subsampling=sub,
                                       progressive=True,
                                       restart_interval=dri))
        assert np.array_equal(prog, seq)


def test_progressive_equals_sequential_noise():
    # random content exercises ZRL, EOB runs and refinement correction
    # bits far harder than smooth gradients
    rng = np.random.RandomState(1)
    for shape in [(8, 8), (7, 5), (16, 24, 3), (33, 17, 3)]:
        src = rng.randint(0, 256, shape).astype(np.uint8)
        seq = decode_jpeg(encode_jpeg(src))
        assert np.array_equal(decode_jpeg(encode_jpeg(src,
                                                      progressive=True)),
                              seq)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(src, progressive=True,
                                    restart_interval=1)), seq)


def test_progressive_uses_non_annex_k_table():
    # the scan script's AC table contains EOBn symbols Annex K.5 lacks;
    # decoding it REQUIRES honoring DHT (the old decoder's blind spot)
    pay = encode_jpeg(_smooth_gray(24, 24), progressive=True)
    from documentai_ray.functions.jpegdec import _PROG_AC_VALS
    assert 0x10 in _PROG_AC_VALS  # EOB1 — absent from K.5
    assert decode_jpeg(pay).shape == (24, 24)


def test_decode_gray_jpeg_handles_color_and_progressive():
    src = _smooth_rgb(20, 28)
    g = decode_gray_jpeg(encode_jpeg(src, subsampling="420",
                                     progressive=True))
    assert g.shape == (20, 28)
    r = src[:, :, 0].astype(np.uint32)
    gg = src[:, :, 1].astype(np.uint32)
    b = src[:, :, 2].astype(np.uint32)
    luma = ((299 * r + 587 * gg + 114 * b + 500) // 1000).astype(np.uint8)
    assert _psnr(luma, g) > 30


def test_unsupported_processes_raise():
    src = _smooth_gray(8, 8)
    pay = bytearray(encode_jpeg(src))
    # flip SOF0 (0xFFC0) to arithmetic SOF9 (SOF3 lossless is now a
    # real decode path, routed separately)
    i = pay.find(b"\xff\xc0")
    pay[i + 1] = 0xC9
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        decode_jpeg(bytes(pay))
    # SOF3 routing: a DCT stream relabeled lossless is malformed and
    # must still raise (its scan data is not Annex-H coded)
    pay[i + 1] = 0xC3
    with pytest.raises(ValueError):
        decode_jpeg(bytes(pay))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


@pytest.mark.parametrize("kind", ["seq_gray", "seq_420", "prog_gray",
                                  "prog_420"])
def test_jpeg_mutation_robustness(kind):
    rng = np.random.RandomState(3)
    if kind == "seq_gray":
        base = encode_jpeg(rng.randint(0, 256, (16, 20)).astype(np.uint8))
    elif kind == "seq_420":
        base = encode_jpeg(rng.randint(0, 256, (17, 21, 3)).astype(
            np.uint8), subsampling="420", restart_interval=2)
    elif kind == "prog_gray":
        base = encode_jpeg(rng.randint(0, 256, (16, 20)).astype(np.uint8),
                           progressive=True)
    else:
        base = encode_jpeg(rng.randint(0, 256, (17, 21, 3)).astype(
            np.uint8), subsampling="420", progressive=True,
            restart_interval=1)
    for t in range(200):
        m = bytearray(base)
        if t % 3 == 0:
            m = m[:rng.randint(4, len(m))]
        elif t % 3 == 1:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            for _ in range(4):
                m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        try:
            decode_jpeg(bytes(m))
        except ValueError:
            pass


def test_cmyk_roundtrip():
    # 4-component Adobe CMYK (APP14 transform 0): decodes to (H, W, 4)
    yy, xx = np.mgrid[0:33, 0:41]
    cmyk = np.dstack([(128 + 70 * np.sin(yy / 6.0)).clip(0, 255),
                      (128 + 70 * np.cos(xx / 8.0)).clip(0, 255),
                      (yy * 4 + xx) % 256,
                      (200 - yy) % 256]).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(cmyk))
    assert back.shape == (33, 41, 4)
    assert _psnr(cmyk, back) > 33
    # constant page: channel 0 uses the luma table (DC-exact at even
    # offsets); chroma-table channels land within ±1
    const = np.zeros((16, 24, 4), np.uint8)
    const[:, :, 0] = 90
    const[:, :, 1] = 130
    const[:, :, 2] = 170
    const[:, :, 3] = 210
    back = decode_jpeg(encode_jpeg(const))
    assert np.array_equal(back[:, :, 0], const[:, :, 0])
    assert np.abs(back.astype(int) - const.astype(int)).max() <= 1


def test_ycck_transform2_decodes():
    # patch the Adobe transform byte to 2: decoder must un-YCbCr the
    # first three channels
    from documentai_ray.functions.jpegdec import _rgb_to_ycbcr

    yy, xx = np.mgrid[0:33, 0:41]
    rgb = np.dstack([(128 + 70 * np.sin(yy / 6.0)).clip(0, 255),
                     (128 + 70 * np.cos(xx / 8.0)).clip(0, 255),
                     (yy * 4 + xx) % 256]).astype(np.uint8)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    k = np.full(rgb.shape[:2], 180.0)
    ycck = np.dstack([y, cb, cr, k]).round().clip(0, 255).astype(np.uint8)
    pay = encode_jpeg(ycck)
    i = pay.find(b"Adobe") + 11
    pay = pay[:i] + bytes([2]) + pay[i + 1:]
    want = np.dstack([rgb, np.full(rgb.shape[:2], 180, np.uint8)])
    assert _psnr(want, decode_jpeg(pay)) > 30


def test_cmyk_gray_reduction():
    from documentai_ray.functions.minijpeg import decode_gray_jpeg

    const = np.full((16, 24, 4), 200, np.uint8)
    g = decode_gray_jpeg(encode_jpeg(const))
    assert g.shape == (16, 24)
    # stored-inverted viewer convention: 200*200//255 = 156 per channel
    assert abs(int(g[0, 0]) - 156) <= 2


class TestLosslessJpeg:
    """SOF3 lossless process (T.81 Annex H): predictors 1-7, 8/16-bit
    precision, RGB, point transform — bit-exact roundtrips."""

    def _g8(self):
        rng = np.random.RandomState(7)
        return (rng.rand(30, 41) * 255).astype(np.uint8)

    @pytest.mark.parametrize("pred", list(range(1, 8)))
    def test_predictors_roundtrip(self, pred):
        from documentai_ray.functions.jpegdec import (
            decode_lossless_jpeg, encode_lossless_jpeg)
        g = self._g8()
        assert np.array_equal(decode_lossless_jpeg(
            encode_lossless_jpeg(g, predictor=pred)), g)

    def test_16bit_roundtrip(self):
        from documentai_ray.functions.jpegdec import (
            decode_lossless_jpeg, encode_lossless_jpeg)
        rng = np.random.RandomState(8)
        g16 = (rng.rand(20, 33) * 65535).astype(np.uint16)
        out = decode_lossless_jpeg(encode_lossless_jpeg(g16))
        assert out.dtype == np.uint16 and np.array_equal(out, g16)

    def test_rgb_roundtrip(self):
        from documentai_ray.functions.jpegdec import (
            decode_lossless_jpeg, encode_lossless_jpeg)
        rng = np.random.RandomState(9)
        rgb = (rng.rand(18, 25, 3) * 255).astype(np.uint8)
        assert np.array_equal(decode_lossless_jpeg(
            encode_lossless_jpeg(rgb, predictor=4)), rgb)

    def test_point_transform(self):
        from documentai_ray.functions.jpegdec import (
            decode_lossless_jpeg, encode_lossless_jpeg)
        g = self._g8()
        out = decode_lossless_jpeg(
            encode_lossless_jpeg(g, point_transform=2))
        assert np.array_equal(out >> 2, g >> 2)

    def test_decode_jpeg_routes_sof3(self):
        from documentai_ray.functions.jpegdec import (decode_jpeg,
                                                      encode_lossless_jpeg)
        g = self._g8()
        assert np.array_equal(decode_jpeg(encode_lossless_jpeg(g)), g)

    def test_restart_intervals_raise(self):
        import struct as _st
        from documentai_ray.functions.jpegdec import (
            decode_lossless_jpeg, encode_lossless_jpeg)
        enc = encode_lossless_jpeg(self._g8())
        i = enc.index(b"\xff\xda")
        dri = b"\xff\xdd" + _st.pack(">H", 4) + _st.pack(">H", 8)
        with pytest.raises(ValueError, match="restart"):
            decode_lossless_jpeg(enc[:i] + dri + enc[i:])


class TestTwelveBitJpeg:
    """12-bit extended sequential (SOF1): decode rides the normal scan
    machinery with the level shift / clip range / dtype at precision
    12; block-constant inputs are bit-exact via the unit quant table."""

    def test_block_constant_exact(self):
        from documentai_ray.functions.jpegdec import (decode_jpeg,
                                                      encode_jpeg12)
        rng = np.random.RandomState(3)
        cells = (rng.rand(3, 5) * 4096).astype(np.uint16)
        img = np.repeat(np.repeat(cells, 8, 0), 8, 1)
        out = decode_jpeg(encode_jpeg12(img))
        assert out.dtype == np.uint16 and np.array_equal(out, img)

    def test_smooth_gradient_near_exact(self):
        from documentai_ray.functions.jpegdec import (decode_jpeg,
                                                      encode_jpeg12)
        y, x = np.mgrid[0:24, 0:40]
        sm = ((y * 31 + x * 17) % 4096).astype(np.uint16)
        out = decode_jpeg(encode_jpeg12(sm))
        assert np.abs(out.astype(int) - sm.astype(int)).max() <= 4

    def test_range_validation(self):
        from documentai_ray.functions.jpegdec import encode_jpeg12
        with pytest.raises(ValueError, match="12-bit"):
            encode_jpeg12(np.full((8, 8), 5000, np.uint16))
