"""MINITIFF — uncompressed grayscale baseline TIFF (stdlib struct).

The last decode hook: TIFF 6.0 baseline bilevel/grayscale with
Compression=1 (none) is pure header + IFD + raw strip bytes — no native
codec needed. Little-endian ("II"), single strip, 8-bit single sample.
Compressed variants (LZW/JPEG-in-TIFF) would still need native libs and
raise ValueError here, explicitly."""

from __future__ import annotations

import struct

import numpy as np

_TAGS = {"width": 256, "height": 257, "bits": 258, "compression": 259,
         "photometric": 262, "strip_offsets": 273, "samples": 277,
         "rows_per_strip": 278, "strip_bytes": 279}


def encode_gray_tiff(img: np.ndarray) -> bytes:
    h, w = img.shape
    raw = img.tobytes()
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8 + 2 + 12 * 9 + 4),  # data after IFD
        (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, len(raw)),
    ]
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += raw
    return bytes(out)


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def decode_gray_tiff(payload: bytes) -> np.ndarray:
    if payload[:4] != b"II*\x00":
        if payload[:4] == b"MM\x00*":
            raise ValueError("big-endian TIFF not supported by minitiff")
        raise ValueError("not a TIFF")
    try:
        (ifd_off,) = struct.unpack_from("<I", payload, 4)
        (n,) = struct.unpack_from("<H", payload, ifd_off)
        tags: dict[int, int] = {}
        for i in range(n):
            tag, typ, cnt, val = struct.unpack_from("<HHII", payload,
                                                    ifd_off + 2 + 12 * i)
            if typ == 3:  # SHORT packed in the low bytes
                val &= 0xFFFF
            tags[tag] = val
    except struct.error as exc:
        raise ValueError(f"truncated TIFF: {exc}") from exc
    if not all(t in tags for t in (256, 257, 273, 279)):
        raise ValueError("missing required TIFF tags")
    if tags.get(_TAGS["compression"], 1) != 1:
        raise ValueError("compressed TIFF requires a native codec")
    if tags.get(_TAGS["bits"], 8) != 8 or tags.get(_TAGS["samples"], 1) != 1:
        raise ValueError("only 8-bit single-sample TIFF supported")
    w, h = tags[_TAGS["width"]], tags[_TAGS["height"]]
    off = tags[_TAGS["strip_offsets"]]
    nbytes = tags[_TAGS["strip_bytes"]]
    if nbytes != w * h or off + nbytes > len(payload):
        raise ValueError("strip size mismatch")
    return np.frombuffer(payload[off:off + nbytes],
                         np.uint8).reshape(h, w).copy()
