"""Minimal grayscale PNG codec — pure stdlib (zlib/struct) + numpy.

The container has no cv2/PIL, but PNG itself is public spec (RFC 2083 /
ISO 15948) and a grayscale 8-bit subset is ~100 lines: IHDR/IDAT/IEND
chunks, zlib-compressed scanlines, filter types 0-4. This gives the image
path REAL decode + pixel kernels instead of stubs: the reference's quality
metrics (quality_analysis_updated/metrics/*.py) operate on grayscale
arrays exactly like the ones produced here.

Scope: 8-bit grayscale (color type 0), no interlace. Encoder writes filter
type 0 (None) scanlines; decoder handles all five standard filters so
foreign single-channel PNGs decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_gray(img: np.ndarray) -> bytes:
    """uint8 HxW array → PNG bytes (grayscale, filter None)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects a uint8 HxW array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIGNATURE


def decode_gray(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 HxW array. Grayscale-8 only; filters 0-4."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={interlace}); minipng reads grayscale-8 only")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("scanline payload size mismatch")
    out = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for r in range(height):
        ftype = raw[r * stride]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=width, offset=r * stride + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraparound == mod 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.empty(width, dtype=np.uint8)
            a = 0
            for x in range(width):
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - 1]) if x else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                a = (int(line[x]) + pred) & 0xFF
                cur[x] = a
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = cur
        prev = cur
    return out
