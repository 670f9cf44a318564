"""MPNG: a minimal stdlib video container (length-prefixed PNG frames).

Real video codecs (H.264/VP9) need native libs this container lacks, but
the RAY-side contract of a video pipeline — wide binary rows, per-frame
decode fan-out, frame sampling before decode — doesn't care about the
codec. MPNG keeps the decode REAL (each frame is a genuine zlib/minipng
PNG decode) while staying stdlib-only, the same move as the miniwav PCM
path (reference has no video path; this extends the multimodal surface).

Layout: ``b"MPNG" | u32 n_frames | n × (u32 len | PNG bytes)``, all
little-endian.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from documentai_ray.functions.minipng import decode_gray, encode_gray

MAGIC = b"MPNG"


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """Pack grayscale frames (2-D uint8 arrays) into an MPNG payload."""
    parts = [MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        png = encode_gray(f)
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def is_mpng(payload: bytes) -> bool:
    return payload[:4] == MAGIC


def frame_count(payload: bytes) -> int:
    if not is_mpng(payload) or len(payload) < 8:
        raise ValueError("not an MPNG payload")
    return struct.unpack_from("<I", payload, 4)[0]


def iter_frames(payload: bytes, *, step: int = 1) -> Iterator[tuple[int, np.ndarray]]:
    """Yield ``(frame_idx, decoded frame)`` for every ``step``-th frame.

    Skipped frames are never DECODED (the expensive part) — the container
    walk just hops over their byte ranges, which is the point of sampling
    before decode."""
    n = frame_count(payload)
    off = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        if i % step == 0:
            yield i, decode_gray(payload[off:off + ln])
        off += ln
