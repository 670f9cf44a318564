"""Minimal PNG codec — pure stdlib (zlib/struct) + numpy.

The container has no cv2/PIL, but PNG itself is public spec (RFC 2083 /
ISO 15948): IHDR/PLTE/tRNS/IDAT/IEND chunks, zlib-compressed scanlines,
filter types 0-4. This gives the image path REAL decode + pixel kernels
instead of stubs: the reference's quality metrics
(quality_analysis_updated/metrics/*.py) operate on grayscale arrays
exactly like the ones produced here.

Scope: the full PNG baseline read path — color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), bit depths 1/2/4/8/16, Adam7
interlacing, all five filters — via :func:`decode_png`;
:func:`decode_gray` keeps its fast grayscale-8 loop for engine-written
payloads and falls back to integer BT.601 luma for foreign color PNGs.
The encoder writes grayscale-8 by default (filter-None scanlines) and
can exercise every decoder path (color types, per-row filters, Adam7)
for round-trip testing.
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


def _filter_row(cur: bytes, prev: bytes, bpp: int, ftype: int) -> bytes:
    """Forward scanline filter (encoder side of PNG §6)."""
    if ftype == 0:
        return cur
    n = len(cur)
    out = bytearray(n)
    for i in range(n):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def _rows_to_scanlines(img: np.ndarray, depth: int, nch: int,
                       ftype: int) -> bytes:
    """(H, W[, C]) array → filtered scanline stream for one (sub)image."""
    h = img.shape[0]
    w = img.shape[1]
    if depth == 8:
        rows = img.reshape(h, w * nch).astype(np.uint8)
        row_bytes = [rows[r].tobytes() for r in range(h)]
    elif depth == 16:
        rows = img.reshape(h, w * nch).astype(">u2")
        row_bytes = [rows[r].tobytes() for r in range(h)]
    else:  # 1/2/4-bit gray or palette indices
        vals = img.reshape(h, w).astype(np.uint8)
        row_bytes = []
        for r in range(h):
            bits = ((vals[r][:, None] >> np.arange(depth - 1, -1, -1))
                    & 1).astype(np.uint8).reshape(-1)
            row_bytes.append(np.packbits(bits).tobytes())
    bpp = max(1, (depth * nch) // 8)
    out = bytearray()
    prev = bytes(len(row_bytes[0])) if h else b""
    for r in range(h):
        out.append(ftype)
        out += _filter_row(row_bytes[r], prev, bpp, ftype)
        prev = row_bytes[r]
    return bytes(out)


def encode_png(img: np.ndarray, *, color_type: int | None = None,
               bit_depth: int = 8, filter_type: int = 0,
               interlace: int = 0,
               palette: np.ndarray | None = None) -> bytes:
    """General PNG writer for round-trip testing every decoder path.

    ``img``: (H, W) gray / palette indices, or (H, W, C) with C in
    {2, 3, 4}. ``color_type`` inferred from shape unless given (pass 3
    with ``palette`` (N, 3) for indexed). ``bit_depth`` 1/2/4/8/16 for
    gray, 8 otherwise. ``filter_type`` applies one fixed filter to every
    row; ``interlace=1`` writes Adam7.
    """
    if color_type is None:
        color_type = 0 if img.ndim == 2 else {2: 4, 3: 2, 4: 6}[img.shape[2]]
    nch = _CHANNELS[color_type]
    h, w = img.shape[0], img.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                       interlace)
    if interlace == 0:
        raw = _rows_to_scanlines(img, bit_depth, nch, filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(_rows_to_scanlines(sub, bit_depth, nch,
                                            filter_type))
        raw = b"".join(parts)
    chunks = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette color type needs a palette")
        chunks += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return (chunks + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _parse_chunks(payload: bytes):
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos = 8
    hdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("malformed IHDR")
            hdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if hdr is None:
        raise ValueError("missing IHDR")
    return hdr, plte, bytes(idat)


def decode_gray(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 HxW array. Fast loop for the engine's own
    grayscale-8 non-interlaced payloads; any other baseline PNG decodes
    through :func:`decode_png` and converts to luma."""
    hdr, _plte, idat = _parse_chunks(payload)
    width, height, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or ctype != 0 or interlace != 0:
        img = decode_png(payload)
        if ctype == 0 and depth < 8:
            # expand 1/2/4-bit gray to full range (255/85/17 steps)
            img = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
        return _to_gray8(img)
    raw = zlib.decompress(idat)
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


# ---------------------------------------------------------------------------
# general baseline decoder (color types 0/2/3/4/6, depths 1-16, Adam7)
# ---------------------------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _unfilter(raw: bytes, height: int, row_bytes: int, bpp: int) -> bytearray:
    """Reverse scanline filtering (PNG §6): returns height*row_bytes raw
    bytes. bpp = bytes per complete pixel (min 1)."""
    stride = row_bytes + 1
    if len(raw) < stride * height:
        raise ValueError("scanline payload size mismatch")
    out = bytearray(height * row_bytes)
    prev_off = -row_bytes
    for r in range(height):
        ftype = raw[r * stride]
        line = raw[r * stride + 1 : r * stride + 1 + row_bytes]
        off = r * row_bytes
        if ftype == 0:
            out[off:off + row_bytes] = line
        elif ftype == 2:
            if r == 0:
                out[off:off + row_bytes] = line
            else:
                pr = np.frombuffer(out, np.uint8, row_bytes, prev_off + off)
                cur = np.frombuffer(line, np.uint8) + pr
                out[off:off + row_bytes] = cur.tobytes()
        elif ftype in (1, 3, 4):
            for i in range(row_bytes):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + off + i] if r else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = (out[prev_off + off + i - bpp]
                         if (r and i >= bpp) else 0)
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                out[off + i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    return out


def _bytes_to_pixels(data: bytes, height: int, width: int, depth: int,
                     nch: int) -> np.ndarray:
    """Unfiltered raw rows → (H, W, nch) array (uint8, or uint16 for
    depth 16)."""
    if depth == 8:
        arr = np.frombuffer(data, np.uint8).reshape(height, width * nch)
        return arr.reshape(height, width, nch)
    if depth == 16:
        arr = np.frombuffer(data, ">u2").astype(np.uint16)
        return arr.reshape(height, width, nch)
    # sub-byte depths: gray (ctype 0) or palette (ctype 3) only → nch == 1
    row_bytes = (width * depth + 7) // 8
    arr = np.frombuffer(data, np.uint8).reshape(height, row_bytes)
    bits = np.unpackbits(arr, axis=1)[:, :width * depth]
    vals = bits.reshape(height, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2, dtype=np.uint16).astype(
        np.uint8)[:, :, None]


def decode_png(payload: bytes) -> np.ndarray:
    """Full baseline PNG decode → (H, W) for grayscale or (H, W, C)
    otherwise; uint8 (uint16 for 16-bit). Palette entries expand to RGB."""
    hdr, plte, idat = _parse_chunks(payload)
    width, height, depth, ctype, comp, filt, interlace = hdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError("sub-byte depth only valid for gray/palette")
    if ctype == 3 and depth == 16:
        raise ValueError("16-bit palette is not legal PNG")
    if width == 0 or height == 0 or width > 1 << 24 or height > 1 << 24:
        raise ValueError("bad PNG dimensions")
    nch = _CHANNELS[ctype]
    bpp = max(1, (depth * nch) // 8)
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"bad IDAT stream: {exc}") from exc

    dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        row_bytes = (width * depth * nch + 7) // 8
        img = _bytes_to_pixels(bytes(_unfilter(raw, height, row_bytes, bpp)),
                               height, width, depth, nch)
    elif interlace == 1:
        img = np.zeros((height, width, nch), dtype)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            row_bytes = (pw * depth * nch + 7) // 8
            need = (row_bytes + 1) * ph
            sub = _bytes_to_pixels(
                bytes(_unfilter(raw[pos:pos + need], ph, row_bytes, bpp)),
                ph, pw, depth, nch)
            pos += need
            img[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"unsupported PNG interlace {interlace}")

    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/malformed PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    if ctype == 0:
        return img[:, :, 0]
    return img


def _to_gray8(img: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma → uint8 HxW; 16-bit scales down by high byte;
    alpha channels are dropped (no compositing — deterministic)."""
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        return img
    if img.shape[2] in (1, 2):  # gray / gray+alpha
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
