"""End-to-end: foreign-flavored image payloads (color / progressive /
interlaced / compressed) flow through the REAL image dispatch that the
imaging + OCR + multimodal stages share — no stage sees anything but a
uint8 grayscale array, whatever the wire format was."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.jpegdec import encode_jpeg
from documentai_ray.functions.minipng import encode_png
from documentai_ray.functions.minitiff import encode_gray_tiff
from documentai_ray.stages.multimodal import _decode_image_real


def _gray(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 5 + xx * 3) % 256).astype(np.uint8)


@pytest.mark.parametrize("make", [
    lambda g: encode_png(np.dstack([g, g, g])),                # RGB PNG
    lambda g: encode_png(g, interlace=1),                      # Adam7
    lambda g: encode_png((g >> 4), bit_depth=4),               # 4-bit gray
    lambda g: encode_jpeg(g, progressive=True),                # prog JPEG
    lambda g: encode_jpeg(np.dstack([g, g, g]),
                          subsampling="420"),                  # color JPEG
    lambda g: encode_gray_tiff(g, compression="lzw",
                               predictor=2),                   # LZW TIFF
    lambda g: encode_gray_tiff(g, compression="packbits",
                               rows_per_strip=5),              # PackBits
], ids=["rgb-png", "adam7-png", "4bit-png", "prog-jpeg", "color-jpeg",
        "lzw-tiff", "packbits-tiff"])
def test_dispatch_decodes_foreign_payloads(make):
    g = _gray()
    out = _decode_image_real(make(g))
    assert out.dtype == np.uint8
    assert out.shape == (24, 32, 1)
    # content sanity: gray-derived payloads must stay close to the source
    # (lossless paths exact; JPEG within quantization error)
    err = np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean()
    assert err < 16


def test_quality_stage_accepts_foreign_payloads():
    # the imaging quality kernels run on whatever the dispatch yields
    from documentai_ray.stages.imaging import exact_metrics, image_verdict

    g = _gray(40, 48)
    for payload in (encode_png(np.dstack([g, g, g])),
                    encode_jpeg(g, progressive=True),
                    encode_gray_tiff(g, compression="lzw")):
        img = _decode_image_real(payload)[:, :, 0]
        m = exact_metrics(img)
        assert isinstance(m, dict) and m
        assert isinstance(image_verdict(m), str)
