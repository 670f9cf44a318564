"""MINITIFF — grayscale baseline TIFF codec (stdlib struct + numpy).

TIFF 6.0 grayscale, 8-bit single sample, little-endian writer with three
REAL compression schemes from the public spec — no native codec needed:

* Compression=1 (none): raw strip bytes.
* Compression=32773 (PackBits, spec §9): byte-oriented RLE — ``n`` in
  [0,127] copies ``n+1`` literals, ``n`` in [129,255] repeats the next
  byte ``257-n`` times, 128 is a no-op.
* Compression=5 (LZW, spec §13): MSB-first variable-width codes starting
  at 9 bits, ClearCode=256, EOI=257, the TIFF "early change" convention
  (width bumps at 511/1023/2047, table reset at 4094), optional
  Predictor=2 horizontal differencing (tag 317).

The reader additionally handles big-endian ("MM") files, multi-strip
layouts (StripOffsets/StripByteCounts arrays, RowsPerStrip) and the
TILED layout (TIFF6 §15: TileWidth/TileLength/TileOffsets/
TileByteCounts, full-size padded edge tiles), plus Compression=7
new-style JPEG-in-TIFF (TIFF TechNote 2: self-contained JPEG strips or
shared tables via the JPEGTables tag 347, merged ahead of each strip's
stream). Exotic variants (old-style Compression=6 JPEG, multi-sample
beyond chunky RGB, <8-bit beyond bilevel) still raise ValueError,
explicitly. Reference parity: the reference ingests TIFF
scans via PIL/cv2 (documentClassifier.py image path); here the decode is
engine-internal so the Ray stages stay dependency-free.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_BYTES = 325
_TAG_JPEG_TABLES = 347

_CLEAR = 256
_EOI = 257


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------

def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >=3 identical bytes become repeat packets
    (max 128), everything else accumulates into literal packets (max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j:j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        ctl = data[i]
        i += 1
        if ctl < 128:
            if i + ctl + 1 > n:
                raise ValueError("truncated PackBits literal packet")
            out += data[i:i + ctl + 1]
            i += ctl + 1
        elif ctl > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat packet")
            out += bytes([data[i]]) * (257 - ctl)
            i += 1
        # ctl == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits stream ended early")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# LZW (TIFF 6.0 §13 — early-change variant, MSB-first bit packing)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW: emits ClearCode first, early width change at
    next_code 511/1023/2047, table reset when next_code hits 4094."""
    bw = _BitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bw.write(_CLEAR, width)
    omega = b""
    for b in data:
        k = bytes([b])
        cand = omega + k
        if cand in table:
            omega = cand
            continue
        bw.write(table[omega], width)
        table[cand] = next_code
        next_code += 1
        omega = k
        if next_code in (511, 1023, 2047):
            width = {511: 10, 1023: 11, 2047: 12}[next_code]
        elif next_code == 4094:
            bw.write(table[omega], width)
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            omega = b""
    if omega:
        bw.write(table[omega], width)
        # the decoder adds one more (phantom) entry on reading this final
        # code; if that crosses an early-change boundary it widens before
        # reading EOI, so the encoder must too (libtiff LZWPostEncode)
        next_code += 1
        if next_code in (511, 1023, 2047):
            width = {511: 10, 1023: 11, 2047: 12}[next_code]
    bw.write(_EOI, width)
    return bw.flush()


def lzw_decode(data: bytes, expected: int | None = None,
               early_change: int = 1) -> bytes:
    """Mirror of :func:`lzw_encode`; decodes until EOI (or ``expected``
    output bytes when given), raising ValueError on any malformed
    stream. PDF's LZWDecode with the default EarlyChange=1 is this
    exact variant (ISO 32000 §7.4.4), so pdfread reuses it with
    ``expected=None``; ``early_change=0`` widens codes one entry later
    (the non-default PDF variant some writers emit)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    old: bytes | None = None
    while expected is None or len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream ended before EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width = 9
            old = None
            continue
        if old is None:
            if code > 255:
                raise ValueError("LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):
            entry = old + old[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        out += entry
        old = entry
        # early change: the decoder's table lags the encoder's by one
        # entry, so it bumps width one entry earlier (510/1022/2046);
        # EarlyChange=0 widens exactly at the table-size boundary
        nxt = len(table) + early_change
        if nxt in (511, 1023, 2047):
            width = {511: 10, 1023: 11, 2047: 12}[nxt]
    if expected is None:
        return bytes(out)
    if len(out) < expected:
        raise ValueError("LZW output shorter than strip size")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# Predictor 2 (horizontal differencing, TIFF 6.0 §14)
# ---------------------------------------------------------------------------

def _diff_rows(img: np.ndarray) -> np.ndarray:
    out = img.astype(np.int16)
    out[:, 1:] = out[:, 1:] - out[:, :-1]
    return (out & 0xFF).astype(np.uint8)


def _undiff_rows(img: np.ndarray) -> np.ndarray:
    return (np.cumsum(img.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _split_jpeg_tables(jpg: bytes) -> tuple[bytes, bytes]:
    """Split a self-contained JPEG into (tables stream, stripped stream)
    per TIFF TechNote 2: DQT/DHT segments move to a JPEGTables-style
    SOI+tables+EOI stream; everything else (SOF/DRI/SOS+entropy data)
    stays in the per-strip stream."""
    if jpg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    tables = bytearray()
    rest = bytearray(b"\xff\xd8")
    pos = 2
    n = len(jpg)
    while pos + 4 <= n:
        if jpg[pos] != 0xFF:
            raise ValueError("bad JPEG marker byte")
        marker = jpg[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xDA:        # SOS: entropy data through EOI
            rest += jpg[pos:]
            return (b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
                    bytes(rest))
        (ln,) = struct.unpack_from(">H", jpg, pos + 2)
        seg = jpg[pos:pos + 2 + ln]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        pos += 2 + ln
    raise ValueError("JPEG without SOS")


def _compress_tiff_block(block: np.ndarray, compression: str,
                         predictor: int, bilevel: bool,
                         w: int) -> bytes:
    """One strip or tile of samples → compressed bytes (shared by the
    stripped and tiled writers)."""
    if compression == "g4":
        from documentai_ray.functions.faxg4 import g4_encode

        # fax convention (PhotometricInterpretation 0): ink = dark
        return g4_encode(block < 128)
    if compression == "mh":
        # Compression=2 (Modified Huffman): per-row 1-D T.4 runs,
        # NO EOLs, each row starting on a byte boundary (TIFF6)
        from documentai_ray.functions.faxg4 import _BitW, _encode_1d_line

        bw = _BitW()
        for rrow in (block < 128):
            _encode_1d_line(bw, rrow, w)
            bw.done()          # flush pads the row to a byte edge
        return bytes(bw.buf)
    if compression in ("g3", "g3_2d"):
        # Compression=3 (T.4 / Group 3): EOL-framed; T4Options
        # bit 0 signals 2-D (mixed MR) coding
        from documentai_ray.functions.faxg4 import g3_encode

        return g3_encode(block < 128, k=0 if compression == "g3" else 4)
    if compression in ("jpeg", "jpeg_tables"):
        # Compression=7 (new-style JPEG-in-TIFF): each strip/tile is a
        # complete JPEG stream (tables split out afterwards for the
        # jpeg_tables mode)
        from documentai_ray.functions.jpegdec import encode_jpeg

        return encode_jpeg(np.ascontiguousarray(block))
    if bilevel:
        raw = np.packbits(block >= 128, axis=1).tobytes()
    else:
        if predictor == 2:
            block = _diff_rows(block)
        raw = block.tobytes()
    if compression == "lzw":
        return lzw_encode(raw)
    if compression == "packbits":
        return packbits_encode(raw)
    return raw


def encode_gray_tiff(img: np.ndarray, compression: str = "none",
                     rows_per_strip: int | None = None,
                     predictor: int = 1, bilevel: bool = False,
                     tile: tuple[int, int] | None = None) -> bytes:
    """Little-endian grayscale TIFF. ``compression`` in {"none",
    "packbits", "lzw"}; ``predictor=2`` (LZW only) applies horizontal
    differencing; ``rows_per_strip`` splits the image into strips;
    ``bilevel=True`` writes 1-bit rows (the scanned-fax layout: pixels
    >= 128 become 1 = black-is-zero white, rows padded to byte
    boundaries). ``tile=(tw, th)`` writes the TILED layout (TIFF6 §15:
    TileWidth/TileLength/TileOffsets/TileByteCounts, full-size padded
    edge tiles, multiples of 16) instead of strips — the remaining
    non-exotic layout in scanned-archive crawls."""
    h, w = img.shape
    comp_id = {"none": 1, "mh": 2, "g3": 3, "g3_2d": 3, "lzw": 5,
               "packbits": 32773, "g4": 4, "jpeg": 7,
               "jpeg_tables": 7}[compression]
    if compression in ("g4", "mh", "g3", "g3_2d"):
        bilevel = True  # fax codecs are inherently bilevel
    if predictor == 2 and (compression != "lzw" or bilevel):
        raise ValueError("predictor=2 only supported with 8-bit lzw here")
    if tile is not None:
        tw, th = tile
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        across = -(-w // tw)
        down = -(-h // th)
        # pad to full tiles with white (cropped away on decode)
        padded = np.full((down * th, across * tw), 255, np.uint8)
        padded[:h, :w] = img
        strips = [
            _compress_tiff_block(
                padded[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw],
                compression, predictor, bilevel, tw)
            for ty in range(down) for tx in range(across)]
        geom_entries = [
            (_TAG_TILE_WIDTH, 3, 1, tw), (_TAG_TILE_LENGTH, 3, 1, th),
            (_TAG_TILE_OFFSETS, 4, len(strips), [0] * len(strips)),
            (_TAG_TILE_BYTES, 4, len(strips),
             [len(s) for s in strips]),
        ]
        offsets_tag = _TAG_TILE_OFFSETS
    else:
        rps = h if rows_per_strip is None \
            else max(1, min(rows_per_strip, h))
        strips = [
            _compress_tiff_block(img[y0:y0 + rps], compression,
                                 predictor, bilevel, w)
            for y0 in range(0, h, rps)]
        nstrips = len(strips)
        geom_entries = [
            (_TAG_STRIP_OFFSETS, 4, nstrips, [0] * nstrips),
            (_TAG_ROWS_PER_STRIP, 3, 1, rps),
            (_TAG_STRIP_BYTES, 4, nstrips, [len(s) for s in strips]),
        ]
        offsets_tag = _TAG_STRIP_OFFSETS

    if compression == "jpeg_tables":
        # shared tables: split each strip, carry ONE copy in tag 347
        split = [_split_jpeg_tables(s) for s in strips]
        tables0 = split[0][0]
        if any(t != tables0 for t, _ in split):
            raise ValueError("inconsistent JPEG tables across strips")
        strips = [r for _, r in split]
        # byte counts in geom_entries were computed pre-split: rebuild
        for gi, (tag, typ, cnt, val) in enumerate(geom_entries):
            if tag in (_TAG_STRIP_BYTES, _TAG_TILE_BYTES):
                geom_entries[gi] = (tag, typ, cnt,
                                    [len(s) for s in strips])
        geom_entries.append((_TAG_JPEG_TABLES, 7, len(tables0),
                             list(tables0)))
    entries: list[tuple[int, int, int, int | list[int]]] = [
        (_TAG_WIDTH, 3, 1, w), (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, 1, 1 if bilevel else 8),
        (_TAG_COMPRESSION, 3, 1, comp_id),
        (_TAG_PHOTOMETRIC, 3, 1,
         0 if compression in ("g4", "mh", "g3", "g3_2d") else 1),
        (_TAG_SAMPLES, 3, 1, 1),
    ] + geom_entries
    if predictor == 2:
        entries.append((_TAG_PREDICTOR, 3, 1, 2))
    if compression in ("g3", "g3_2d"):
        entries.append((292, 4, 1, 1 if compression == "g3_2d" else 0))
    entries.sort(key=lambda e: e[0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # out-of-line arrays (needed when a LONG-array tag has count > 1);
    # sizes are known up front, so strip offsets can be computed before
    # the array bytes are packed
    arrays_off = ifd_off + ifd_size
    array_pos: dict[int, int] = {}
    esize = {1: 1, 3: 2, 4: 4, 7: 1}
    efmt = {1: "B", 3: "H", 4: "I", 7: "B"}
    pos = arrays_off
    for tag, typ, cnt, val in entries:
        if isinstance(val, list) and esize[typ] * cnt > 4:
            array_pos[tag] = pos
            pos += esize[typ] * cnt
    data_off = pos
    offsets: list[int] = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == offsets_tag:
            val = offsets
        if isinstance(val, list) and tag in array_pos:
            out += struct.pack("<HHII", tag, typ, cnt, array_pos[tag])
        elif isinstance(val, list):
            packed = struct.pack(f"<{cnt}{efmt[typ]}", *val)
            out += struct.pack("<HHI", tag, typ, cnt)
            out += packed + b"\x00" * (4 - len(packed))
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    for tag, typ, cnt, val in entries:
        if tag == offsets_tag:
            val = offsets
        if isinstance(val, list) and tag in array_pos:
            out += struct.pack(f"<{cnt}{efmt[typ]}", *val)
    for s in strips:
        out += s
    return bytes(out)


def encode_rgb_tiff(img: np.ndarray, compression: str = "none",
                    rows_per_strip: int | None = None) -> bytes:
    """(H, W, 3) uint8 → chunky RGB TIFF (PhotometricInterpretation 2,
    SamplesPerPixel 3), little-endian, same compression options as the
    grayscale writer. The engine's decode reduces RGB to BT.601 luma."""
    h, w, nch = img.shape
    if nch != 3:
        raise ValueError("encode_rgb_tiff expects (H, W, 3)")
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    rps = h if rows_per_strip is None else max(1, min(rows_per_strip, h))
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        raw = img[y0:y0 + rps].tobytes()
        if compression == "lzw":
            strips.append(lzw_encode(raw))
        elif compression == "packbits":
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)
    nstrips = len(strips)
    entries: list[tuple[int, int, int, int | list[int]]] = [
        (_TAG_WIDTH, 3, 1, w), (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, 3, [8, 8, 8]),
        (_TAG_COMPRESSION, 3, 1, comp_id),
        (_TAG_PHOTOMETRIC, 3, 1, 2),
        (_TAG_STRIP_OFFSETS, 4, nstrips, [0] * nstrips),
        (_TAG_SAMPLES, 3, 1, 3), (_TAG_ROWS_PER_STRIP, 3, 1, rps),
        (_TAG_STRIP_BYTES, 4, nstrips, [len(s) for s in strips]),
    ]
    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    arrays_off = ifd_off + ifd_size
    array_pos: dict[int, int] = {}
    pos = arrays_off
    for tag, typ, cnt, val in entries:
        if isinstance(val, list) and (typ == 4 and cnt > 1
                                      or typ == 3 and cnt > 2):
            array_pos[tag] = pos
            pos += (4 if typ == 4 else 2) * cnt
    offsets: list[int] = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == _TAG_STRIP_OFFSETS:
            val = offsets
        if isinstance(val, list):
            if tag in array_pos:
                field = array_pos[tag]
            elif typ == 3 and cnt == 2:
                field = val[0] | (val[1] << 16)
            else:
                field = val[0]
        else:
            field = val
        out += struct.pack("<HHII", tag, typ, cnt, field)
    out += struct.pack("<I", 0)
    for tag, typ, cnt, val in entries:
        if tag == _TAG_STRIP_OFFSETS:
            val = offsets
        if tag in array_pos:
            out += struct.pack(f"<{cnt}{'I' if typ == 4 else 'H'}", *val)
    for s in strips:
        out += s
    return bytes(out)


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def _read_tag_values(payload: bytes, endian: str, typ: int, cnt: int,
                     field_bytes: bytes) -> list[int] | None:
    """IFD value field: inline when it fits in 4 bytes, else an offset.

    Only SHORT (3) and LONG (4) carry the geometry/layout values this
    decoder consumes, plus BYTE/UNDEFINED (1/7) for the JPEGTables
    blob; any other type (RATIONAL XResolution, ASCII
    Software/DateTime — near-universal in real scans) returns None and
    the tag is IGNORED rather than rejecting the whole file (ADVICE r3:
    required tags are re-checked by name after the scan)."""
    sizes = {1: 1, 3: 2, 4: 4, 7: 1}
    if typ not in sizes:
        return None
    if cnt == 0 or cnt > 1_000_000:
        raise ValueError(f"malformed TIFF tag count {cnt}")
    fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
    total = sizes[typ] * cnt
    if total <= 4:
        return list(struct.unpack(f"{endian}{cnt}{fmt}", field_bytes[:total]))
    (off,) = struct.unpack(f"{endian}I", field_bytes)
    if off + total > len(payload):
        raise ValueError("TIFF tag array out of bounds")
    return list(struct.unpack_from(f"{endian}{cnt}{fmt}", payload, off))


def _decode_tiff_block(raw: bytes, comp: int, bits: int, samples: int,
                       photometric: int, predictor: int, w: int,
                       nrows: int, tags: dict) -> np.ndarray:
    """One strip or tile → uint8 gray (nrows, w) block, shared by the
    stripped and tiled layouts (same codecs, different geometry)."""
    row_bytes = (w * bits * samples + 7) // 8
    expected = nrows * row_bytes
    if comp == 7:  # new-style JPEG-in-TIFF (TechNote 2)
        from documentai_ray.functions.jpegdec import decode_jpeg

        raw = bytes(raw)
        if raw[:2] != b"\xff\xd8":
            raise ValueError("JPEG strip without SOI")
        tables = bytes(tags.get(_TAG_JPEG_TABLES, []))
        if tables:
            # the JPEGTables stream is SOI + DQT/DHT... + EOI; its
            # tables logically precede every strip's stream — merge by
            # splicing them right after the strip's SOI (a later
            # in-strip DQT/DHT legally redefines)
            if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
                raise ValueError("malformed JPEGTables stream")
            raw = raw[:2] + tables[2:-2] + raw[2:]
        img = decode_jpeg(raw)
        if img.ndim == 3:  # YCbCr/RGB strip → BT.601 luma gray
            p32 = img.astype(np.int64)
            img = ((299 * p32[:, :, 0] + 587 * p32[:, :, 1]
                    + 114 * p32[:, :, 2] + 500) // 1000).astype(np.uint8)
        if img.shape != (nrows, w):
            raise ValueError("JPEG strip dimension mismatch")
        return img
    if comp in (2, 3, 4):  # fax family: ink (black run) = dark
        from documentai_ray.functions.faxg4 import g3_decode, g4_decode

        if comp == 4:
            ink = g4_decode(raw, w, nrows)
        elif comp == 2:
            # MH: per-row byte-aligned 1-D runs, no EOL framing
            ink = g3_decode(raw, w, nrows, k=0, eol=False,
                            byte_align=True)
        else:
            t4 = tags.get(292, [0])[0]       # T4Options
            ink = g3_decode(raw, w, nrows,
                            k=1 if t4 & 1 else 0, eol=True)
        if photometric == 1:
            ink = ~ink
        return np.where(ink, 0, 255).astype(np.uint8)
    if comp == 1:
        if len(raw) < expected:
            raise ValueError("strip size mismatch")
        data = raw[:expected]
    elif comp == 5:
        data = lzw_decode(raw, expected)
    else:
        data = packbits_decode(raw, expected)
    if bits == 1:
        packed = np.frombuffer(data, np.uint8).reshape(nrows, row_bytes)
        unpacked = np.unpackbits(packed, axis=1)[:, :w]
        # BlackIsZero: bit 1 = white; WhiteIsZero (fax default): invert
        if photometric == 0:
            unpacked = 1 - unpacked
        return (unpacked * 255).astype(np.uint8)
    if samples == 3:  # chunky RGB → integer BT.601 luma gray
        rgb = np.frombuffer(data, np.uint8).reshape(
            nrows, w, 3).astype(np.uint32)
        if predictor == 2:  # per-sample horizontal differencing
            rgb = (np.cumsum(rgb, axis=1) & 0xFF)
        return ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1]
                 + 114 * rgb[:, :, 2] + 500) // 1000).astype(np.uint8)
    block = np.frombuffer(data, np.uint8).reshape(nrows, w)
    if predictor == 2:
        block = _undiff_rows(block)
    return block


def decode_gray_tiff(payload: bytes) -> np.ndarray:
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    try:
        (ifd_off,) = struct.unpack_from(f"{endian}I", payload, 4)
        (n,) = struct.unpack_from(f"{endian}H", payload, ifd_off)
        tags: dict[int, list[int]] = {}
        for i in range(n):
            base = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(f"{endian}HHI", payload, base)
            vals = _read_tag_values(payload, endian, typ, cnt,
                                    payload[base + 8:base + 12])
            if vals is not None:  # unhandled-type tags are ignored
                tags[tag] = vals
    except struct.error as exc:
        raise ValueError(f"truncated TIFF: {exc}") from exc
    tiled = _TAG_TILE_OFFSETS in tags
    need = ((_TAG_WIDTH, _TAG_HEIGHT, _TAG_TILE_WIDTH, _TAG_TILE_LENGTH,
             _TAG_TILE_OFFSETS, _TAG_TILE_BYTES) if tiled else
            (_TAG_WIDTH, _TAG_HEIGHT, _TAG_STRIP_OFFSETS,
             _TAG_STRIP_BYTES))
    for t in need:
        if t not in tags:
            raise ValueError("missing required TIFF tags")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp not in (1, 2, 3, 4, 5, 7, 32773):
        raise ValueError(f"TIFF compression {comp} not supported")
    bits = tags.get(_TAG_BITS, [8])[0]
    samples = tags.get(_TAG_SAMPLES, [1])[0]
    if comp in (2, 3, 4) and (bits != 1 or samples != 1):
        raise ValueError("fax compression is bilevel only")
    if comp == 7 and bits != 8:
        raise ValueError("JPEG-in-TIFF requires 8-bit samples")
    if bits not in (1, 8) or samples not in (1, 3):
        raise ValueError("only 1/8-bit, 1/3-sample TIFF supported")
    if samples == 3 and bits != 8:
        raise ValueError("RGB TIFF requires 8-bit samples")
    photometric = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2) or (predictor == 2 and bits == 1):
        raise ValueError(f"TIFF predictor {predictor} not supported")
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    if tiled:
        # TIFF6 §15: full-size padded tiles, left-to-right then
        # top-to-bottom; each tile compresses independently with the
        # same codec as a strip would
        tw = tags[_TAG_TILE_WIDTH][0]
        th = tags[_TAG_TILE_LENGTH][0]
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        offsets = tags[_TAG_TILE_OFFSETS]
        byte_counts = tags[_TAG_TILE_BYTES]
        if len(offsets) != len(byte_counts):
            raise ValueError("tile offset/bytecount length mismatch")
        across = -(-w // tw)
        down = -(-h // th)
        if len(offsets) != across * down:
            raise ValueError("tile count mismatch")
        out = np.zeros((h, w), np.uint8)
        for i, (off, nbytes) in enumerate(zip(offsets, byte_counts)):
            if off + nbytes > len(payload):
                raise ValueError("tile out of bounds")
            tx = (i % across) * tw
            ty = (i // across) * th
            block = _decode_tiff_block(
                payload[off:off + nbytes], comp, bits, samples,
                photometric, predictor, tw, th, tags)
            out[ty:ty + th, tx:tx + tw] = \
                block[:h - ty, :w - tx]
        return out
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    offsets = tags[_TAG_STRIP_OFFSETS]
    byte_counts = tags[_TAG_STRIP_BYTES]
    if len(offsets) != len(byte_counts):
        raise ValueError("strip offset/bytecount length mismatch")
    rows = []
    y = 0
    for off, nbytes in zip(offsets, byte_counts):
        if off + nbytes > len(payload):
            raise ValueError("strip out of bounds")
        strip_rows = min(rps, h - y)
        rows.append(_decode_tiff_block(
            payload[off:off + nbytes], comp, bits, samples, photometric,
            predictor, w, strip_rows, tags))
        y += strip_rows
    if y != h:
        raise ValueError("strips do not cover the image height")
    return np.vstack(rows).copy() if len(rows) > 1 else rows[0].copy()
