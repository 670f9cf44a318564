"""Baseline JFIF grayscale codec."""

from __future__ import annotations

import numpy as np
import pytest


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    if mse == 0:
        return 99.0
    return 10 * np.log10(255.0 ** 2 / mse)


def test_jfif_segment_framing():
    from documentai_ray.functions.minijpeg import encode_gray_jpeg

    img = np.full((16, 16), 128, np.uint8)
    b = encode_gray_jpeg(img)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    # SOF0 present with true dims
    i = b.find(b"\xff\xc0")
    assert i > 0
    assert b[i + 5:i + 9] == (16).to_bytes(2, "big") * 2


def test_roundtrip_constant_and_gradient():
    from documentai_ray.functions.minijpeg import (decode_gray_jpeg,
                                                   encode_gray_jpeg)

    flat = np.full((24, 40), 200, np.uint8)
    out = decode_gray_jpeg(encode_gray_jpeg(flat))
    assert out.shape == (24, 40)
    assert _psnr(flat, out) > 45  # constant blocks survive almost exactly

    y, x = np.mgrid[0:32, 0:48]
    grad = ((y * 3 + x * 2) % 256).astype(np.uint8)
    out = decode_gray_jpeg(encode_gray_jpeg(grad))
    assert out.shape == grad.shape
    assert _psnr(grad, out) > 25


def test_roundtrip_noise_and_odd_dims():
    from documentai_ray.functions.minijpeg import (decode_gray_jpeg,
                                                   encode_gray_jpeg)

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (19, 23), np.uint8)  # non-multiple-of-8 dims
    out = decode_gray_jpeg(encode_gray_jpeg(img))
    assert out.shape == (19, 23)
    # noise is worst-case for JPEG; just require a sane reconstruction
    assert _psnr(img, out) > 18


def test_decode_rejects_garbage():
    from documentai_ray.functions.minijpeg import decode_gray_jpeg, is_jpeg

    assert not is_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_gray_jpeg(b"garbage bytes")
    with pytest.raises(ValueError):
        decode_gray_jpeg(b"\xff\xd8truncated")


def test_tiff_roundtrip_exact():
    from documentai_ray.functions.minitiff import (decode_gray_tiff,
                                                   encode_gray_tiff, is_tiff)

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (13, 21), np.uint8)
    payload = encode_gray_tiff(img)
    assert is_tiff(payload)
    assert (decode_gray_tiff(payload) == img).all()  # lossless


def test_tiff_rejects_compressed_and_garbage():
    from documentai_ray.functions.minitiff import decode_gray_tiff

    with pytest.raises(ValueError):
        decode_gray_tiff(b"garbage")
    with pytest.raises(ValueError):
        decode_gray_tiff(b"MM\x00*big endian")


def test_decode_dispatch_covers_all_three():
    from documentai_ray.functions.minijpeg import encode_gray_jpeg
    from documentai_ray.functions.minipng import encode_gray
    from documentai_ray.functions.minitiff import encode_gray_tiff
    from documentai_ray.stages.multimodal import _decode_image_real

    img = np.full((8, 8), 77, np.uint8)
    assert _decode_image_real(encode_gray(img)).shape == (8, 8, 1)
    assert _decode_image_real(encode_gray_jpeg(img)).shape == (8, 8, 1)
    assert (_decode_image_real(encode_gray_tiff(img))[:, :, 0] == img).all()
