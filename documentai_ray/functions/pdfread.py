"""Real-`%PDF-` text extraction — the S1/M1 real-format loop (VERDICT r2 #2).

The reference's core PDF path is ``fitz.open`` + ``page.get_text()`` joined
with ``"\\n"`` across pages
(/root/reference/microservices/entity-extraction-service/app.py:515-533) and
the layout walk ``page.get_text("dict")`` → blocks → lines → spans
(app.py:547-593). PyMuPDF is not in this container, so this module is a
from-scratch parser for the PDF 1.4 subset the engine itself writes
(`functions/pdfwrite.py`) plus the common constructs of simple real-world
files: uncompressed or `/FlateDecode` content streams, literal and hex
strings, the full text-positioning operator set (`BT/ET`, `Tf`, `Td`, `TD`,
`TL`, `T*`, `Tm`, `Tj`, `TJ`, `'`, `"`).

Extraction semantics (the canonical spec, mirroring the reference's
get_text page order):

- pages in `/Root → /Pages → /Kids` order (fallback: `/Type /Page` objects
  in object-number order when the trailer is damaged);
- within a page, text runs are grouped into LINES by their y start
  coordinate (runs within 1.0 unit share a line) and lines are sorted
  top-first (descending y — PDF user space is y-up); runs within a line
  sort by x and join with a single space;
- lines join with ``"\\n"``; pages join with ``"\\n"`` (one separator per
  page boundary, M1 semantics).

Any structural damage (no objects, no pages, bad stream) raises
``ValueError`` — the extract stage converts that to an error row
(documentClassifier.py:888-896 semantics).

Word boxes: one box per whitespace-separated word, advance approximated at
0.6·font_size per character (Helvetica-average metric; the writer embeds no
width tables). Coordinates are emitted top-left-origin and ×2-scaled like
the MINIPDF walk (app.py:571-579 frontend overlay parity). Boxes are
positional aids — the byte-identity contract is on the TEXT only.
"""

from __future__ import annotations

import re
import zlib
from typing import Any

MAGIC = b"%PDF-"

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_WS = b"\x00\t\n\x0c\r "


def is_pdf(payload: bytes) -> bool:
    return payload[: len(MAGIC)] == MAGIC


# ---------------------------------------------------------------------------
# object scan
# ---------------------------------------------------------------------------

def _skip_ws(buf: bytes, pos: int) -> int:
    n = len(buf)
    while pos < n and buf[pos] in _WS:
        pos += 1
    return pos


def _match_dict(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Balanced ``<< … >>`` scan (string-aware). Returns (dict_bytes, end)."""
    assert buf[pos:pos + 2] == b"<<"
    depth = 0
    i = pos
    n = len(buf)
    while i < n:
        c = buf[i]
        if buf[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif buf[i:i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return buf[pos:i], i
        elif c == 0x28:  # '(' literal string — skip with escapes
            i += 1
            nest = 1
            while i < n and nest:
                if buf[i] == 0x5C:
                    i += 2
                    continue
                if buf[i] == 0x28:
                    nest += 1
                elif buf[i] == 0x29:
                    nest -= 1
                i += 1
        else:
            i += 1
    raise ValueError("unterminated dictionary")


def parse_objects(pdf: bytes, password: bytes = b""
                  ) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential tolerant object scan → ``{num: (dict_bytes, stream|None)}``.

    Sequential (not finditer over the whole file) so binary stream bodies
    can never be misread as object headers: after each `stream` keyword the
    scan jumps `/Length` bytes. Indirect `/Length n 0 R` falls back to an
    `endstream` search."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    n = len(pdf)
    while True:
        m = _OBJ_RE.search(pdf, pos)
        if m is None:
            break
        num = int(m.group(1))
        i = _skip_ws(pdf, m.end())
        dct = b""
        stream: bytes | None = None
        if pdf[i:i + 2] == b"<<":
            dct, i = _match_dict(pdf, i)
            j = _skip_ws(pdf, i)
            if pdf[j:j + 6] == b"stream":
                j += 6
                if pdf[j:j + 2] == b"\r\n":
                    j += 2
                elif pdf[j:j + 1] == b"\n":
                    j += 1
                lm = re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", dct)
                if lm:
                    ln = int(lm.group(1))
                    stream = pdf[j:j + ln]
                    i = j + ln
                else:  # indirect /Length — tolerate by scanning
                    end = pdf.find(b"endstream", j)
                    if end == -1:
                        raise ValueError("unterminated stream")
                    stream = pdf[j:end].rstrip(b"\r\n")
                    i = end
        end = pdf.find(b"endobj", i)
        if end == -1:
            break
        objects[num] = (dct, stream)
        pos = end + 6
        if pos >= n:
            break
    if not objects:
        raise ValueError("no PDF objects found")
    _decrypt_if_needed(pdf, objects, password)
    expand_object_streams(objects)
    return objects


def _decrypt_if_needed(pdf: bytes,
                       objects: dict[int, tuple[bytes, bytes | None]],
                       password: bytes = b"") -> None:
    """Standard-security-handler decryption (ISO 32000 §7.6.3) for files
    whose trailer carries ``/Encrypt`` — the empty-user-password RC4
    case conforming readers open transparently. Stream bytes decrypt
    with the per-object key BEFORE filters/ObjStm expansion; the encrypt
    dictionary itself and /Type /XRef streams are never encrypted.
    Unsupported schemes (AES, real user passwords) raise ValueError →
    error row."""
    em = re.search(rb"/Encrypt\s+(\d+)\s+0\s+R", pdf)
    if not em:
        return
    from documentai_ray.functions.pdfcrypt import Decryptor, find_file_id

    enc_num = int(em.group(1))
    enc_dct = objects.get(enc_num, (b"", None))[0]
    if not enc_dct:
        raise ValueError("dangling /Encrypt reference")
    from documentai_ray.functions.pdfcrypt import map_dict_strings

    dec = Decryptor(enc_dct, find_file_id(pdf), password)

    def _dec_string(raw: bytes, num: int) -> bytes:
        # Per-string tolerance: some wild writers leave individual
        # strings unencrypted (e.g. a literal empty string shorter than
        # an AES IV+block) — keep the original bytes rather than failing
        # the whole document on one string (ADVICE r4).
        try:
            return dec.decrypt(raw, num)
        except ValueError:
            return raw

    for num, (dct, stream) in list(objects.items()):
        if num == enc_num:
            continue
        if b"/Type /XRef" in dct or b"/Type/XRef" in dct:
            continue
        # ISO 32000 encrypts ALL strings routed through /StrF, not just
        # streams: /Info values, outline /Title, /URI actions... decrypt
        # them with the same per-object key so the metadata surfaces read
        # plaintext (ADVICE r3) — unless /StrF is /Identity (ADVICE r4).
        if dec.strings_encrypted:
            dct = map_dict_strings(dct, lambda raw: _dec_string(raw, num))
        if dec.streams_encrypted and stream is not None:
            stream = dec.decrypt(stream, num)
        objects[num] = (dct, stream)


def _ref_list(dct: bytes, key: bytes) -> list[int]:
    """Object numbers from ``/Key [a 0 R b 0 R …]`` or ``/Key a 0 R``."""
    m = re.search(key + rb"\s*\[([^\]]*)\]", dct)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", m.group(1))]
    m = re.search(key + rb"\s+(\d+)\s+0\s+R", dct)
    return [int(m.group(1))] if m else []


# ---------------------------------------------------------------------------
# stream filters (ISO 32000 §7.4) — chains, predictors, the common five
# ---------------------------------------------------------------------------

def _ascii_hex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    digits = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise ValueError(f"bad ASCIIHexDecode data: {exc}") from exc


def _ascii85_decode(data: bytes) -> bytes:
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    if data.startswith(b"<~"):
        data = data[2:]
    out = bytearray()
    group: list[int] = []
    for b in data:
        if b in b"\x00\t\n\x0c\r ":
            continue
        if b == 0x7A:  # 'z' — four zero bytes, only between groups
            if group:
                raise ValueError("ASCII85 'z' inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= b <= 0x75:
            raise ValueError(f"bad ASCII85 byte {b}")
        group.append(b - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85 group overflow")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85 trailing single digit")
        k = len(group)
        group += [84] * (5 - k)
        v = 0
        for g in group:
            v = v * 85 + g
        out += v.to_bytes(4, "big")[:k - 1]
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ctl = data[i]
        i += 1
        if ctl == 128:  # EOD
            break
        if ctl < 128:
            if i + ctl + 1 > n:
                raise ValueError("truncated RunLength literal")
            out += data[i:i + ctl + 1]
            i += ctl + 1
        else:
            if i >= n:
                raise ValueError("truncated RunLength repeat")
            out += bytes([data[i]]) * (257 - ctl)
            i += 1
    return bytes(out)


def _parse_decode_parms(dct: bytes, nfilters: int) -> list[dict[str, int]]:
    """Predictor/Columns/Colors/BitsPerComponent per filter position."""
    m = re.search(rb"/(?:DecodeParms|DP)\s*(\[[^\]]*\]|<<.*?>>|null)", dct,
                  re.S)
    parms: list[dict[str, int]] = [{} for _ in range(nfilters)]
    if not m:
        return parms
    spec = m.group(1)
    dicts = re.findall(rb"<<(.*?)>>|(null)", spec, re.S) \
        if spec.startswith(b"[") else [(spec.strip(b"<>"), b"")]
    for i, (body, _null) in enumerate(dicts[:nfilters]):
        for key in (b"Predictor", b"Columns", b"Colors",
                    b"BitsPerComponent", b"EarlyChange", b"Rows"):
            km = re.search(rb"/" + key + rb"\s+(\d+)", body)
            if km:
                parms[i][key.decode()] = int(km.group(1))
        km = re.search(rb"/K\s+(-?\d+)", body)
        if km:
            parms[i]["K"] = int(km.group(1))
        for bkey in (b"BlackIs1", b"EndOfLine", b"EncodedByteAlign"):
            km = re.search(rb"/" + bkey + rb"\s+(true|false)", body)
            if km:
                parms[i][bkey.decode()] = int(km.group(1) == b"true")
    return parms


def _apply_predictor(data: bytes, pm: dict[str, int]) -> bytes:
    pred = pm.get("Predictor", 1)
    if pred <= 1:
        return data
    colors = pm.get("Colors", 1)
    bpc = pm.get("BitsPerComponent", 8)
    columns = pm.get("Columns", 1)
    bpp = max(1, (colors * bpc) // 8)
    row_bytes = (columns * colors * bpc + 7) // 8
    if pred == 2:  # TIFF horizontal differencing (8-bit only here)
        if bpc != 8:
            raise ValueError("TIFF predictor needs 8-bit components")
        arr = bytearray(data)
        for r0 in range(0, len(arr) - row_bytes + 1, row_bytes):
            for i in range(bpp, row_bytes):
                arr[r0 + i] = (arr[r0 + i] + arr[r0 + i - bpp]) & 0xFF
        return bytes(arr)
    if pred >= 10:  # PNG predictors: 1 tag byte per row, PNG unfilter
        from documentai_ray.functions.minipng import _unfilter

        stride = row_bytes + 1
        height = len(data) // stride
        if height * stride != len(data):
            raise ValueError("predictor row size mismatch")
        return bytes(_unfilter(data, height, row_bytes, bpp))
    raise ValueError(f"unsupported predictor {pred}")


def decode_stream(dct: bytes, stream: bytes,
                  objects: dict[int, tuple[bytes, bytes | None]]
                  | None = None) -> bytes:
    """Apply the ``/Filter`` chain (single name or array, decoding
    order) with per-filter ``/DecodeParms``. ``objects`` (when the
    caller has the document's object map) lets filters dereference
    indirect DecodeParms streams — today that is ``/JBIG2Globals``."""
    fm = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", dct)
    if not fm:
        return stream
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    parms = _parse_decode_parms(dct, len(names))
    data = stream
    for name, pm in zip(names, parms):
        if name == b"FlateDecode" or name == b"Fl":
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream: {exc}") from exc
            data = _apply_predictor(data, pm)
        elif name == b"LZWDecode" or name == b"LZW":
            from documentai_ray.functions.minitiff import lzw_decode

            data = lzw_decode(data,
                              early_change=pm.get("EarlyChange", 1))
            data = _apply_predictor(data, pm)
        elif name == b"ASCIIHexDecode" or name == b"AHx":
            data = _ascii_hex_decode(data)
        elif name == b"ASCII85Decode" or name == b"A85":
            data = _ascii85_decode(data)
        elif name == b"RunLengthDecode" or name == b"RL":
            data = _run_length_decode(data)
        elif name == b"JBIG2Decode":
            import numpy as np

            from documentai_ray.functions.jbig2 import jbig2_decode

            globals_data = b""
            gm = re.search(rb"/JBIG2Globals\s+(\d+)\s+0\s+R", dct)
            if gm:
                # the STANDARD wild scanner layout: one shared symbol
                # dictionary in an indirect Globals stream, per-page
                # text regions referencing it (T.88 embedding rules /
                # ISO 32000 §7.4.7) — logically prepended to the page's
                # segment stream. Reference parity: fitz reads these
                # (documentClassifier.py:1361).
                if objects is None:
                    raise ValueError(
                        "JBIG2Globals needs the document object map")
                gnum = int(gm.group(1))
                if gnum not in objects:
                    raise ValueError("dangling /JBIG2Globals reference")
                gdct, gstream = objects[gnum]
                if gstream is None:
                    raise ValueError("/JBIG2Globals is not a stream")
                globals_data = decode_stream(gdct, gstream, objects)
            ink = jbig2_decode(data, globals_data)  # JBIG2: 1 = black
            # downstream bilevel convention: packed sample 1 = white
            data = np.packbits(~ink, axis=1).tobytes()
        elif name == b"CCITTFaxDecode" or name == b"CCF":
            import numpy as np

            from documentai_ray.functions.faxg4 import g3_decode, g4_decode

            cols = pm.get("Columns", 1728)
            nrows = pm.get("Rows", 0)
            if nrows <= 0:
                raise ValueError("CCITTFaxDecode needs /Rows")
            k = pm.get("K", 0)
            if k < 0:          # Group 4 (pure 2-D MMR)
                ink = g4_decode(data, cols, nrows)
            else:              # Group 3: K=0 pure 1-D MH, K>0 mixed MR
                ink = g3_decode(
                    data, cols, nrows, k=k,
                    eol=bool(pm.get("EndOfLine", 0)) or k > 0,
                    byte_align=bool(pm.get("EncodedByteAlign", 0)))
            bits = ink if pm.get("BlackIs1", 0) else ~ink
            data = np.packbits(bits, axis=1).tobytes()
        else:
            raise ValueError(f"unsupported PDF filter /{name.decode()}")
    return data


def expand_object_streams(
        objects: dict[int, tuple[bytes, bytes | None]]) -> None:
    """Merge objects packed in `/Type /ObjStm` streams (PDF 1.5+,
    ISO 32000 §7.5.7) into the map. Compressed objects are dict/value
    only (streams are illegal inside ObjStm)."""
    for _num, (dct, stream) in list(objects.items()):
        if stream is None or not re.search(rb"/Type\s*/ObjStm\b", dct):
            continue
        data = decode_stream(dct, stream)
        nm = re.search(rb"/N\s+(\d+)", dct)
        fm = re.search(rb"/First\s+(\d+)", dct)
        if not nm or not fm:
            raise ValueError("ObjStm missing /N or /First")
        n_objs, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n_objs:
            raise ValueError("short ObjStm header")
        pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                 for i in range(n_objs)]
        for i, (onum, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(data)
            body = data[first + off:end].strip()
            # a direct (uncompressed) definition wins per the spec's
            # xref precedence; in-practice they never collide
            objects.setdefault(onum, (body, None))


def page_content_streams(pdf: bytes) -> list[bytes]:
    """Decoded content-stream bytes per page, in document page order."""
    return [s for s, _f in page_contents_and_fonts(pdf)]


def page_contents_and_fonts(
        pdf: bytes, password: bytes = b""
        ) -> list[tuple[bytes, dict[bytes, dict | None]]]:
    """Per page (document order): decoded content-stream bytes + the
    page's font map (name → /ToUnicode CMap or None)."""
    objects = parse_objects(pdf, password)
    page_ids: list[int] = []
    root_ids = []
    tm = re.search(rb"/Root\s+(\d+)\s+0\s+R", pdf)
    if tm and int(tm.group(1)) in objects:
        root_ids = _ref_list(objects[int(tm.group(1))][0], rb"/Pages")
    kids: list[int] = []
    if root_ids and root_ids[0] in objects:
        stack = [root_ids[0]]
        while stack:  # walk the page tree (handles nested /Pages nodes)
            nid = stack.pop(0)
            dct = objects.get(nid, (b"", None))[0]
            if b"/Type /Pages" in dct or b"/Type/Pages" in dct:
                stack = _ref_list(dct, rb"/Kids") + stack
            else:
                kids.append(nid)
    if kids:
        page_ids = kids
    else:  # damaged trailer: every /Type /Page object, object order
        page_ids = sorted(
            num for num, (dct, _s) in objects.items()
            if re.search(rb"/Type\s*/Page\b", dct))
    if not page_ids:
        raise ValueError("no pages")
    out: list[tuple[bytes, dict[bytes, dict | None]]] = []
    for pid in page_ids:
        dct = objects.get(pid, (b"", None))[0]
        parts: list[bytes] = []
        for cid in _ref_list(dct, rb"/Contents"):
            cdct, cstream = objects.get(cid, (b"", None))
            if cstream is None:
                continue
            parts.append(decode_stream(cdct, cstream))
        out.append((b"\n".join(parts), page_fonts(objects, dct)))
    return out


# ---------------------------------------------------------------------------
# content-stream tokenizer + text assembly
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\x00\t\n\x0c\r /\[\]<>(){}%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _parse_literal_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    """``(...)`` with nesting + escapes → raw bytes, per ISO 32000 §7.3.4.2."""
    assert buf[pos] == 0x28
    # fast path: no backslash and no nested paren before the first ')' —
    # the overwhelmingly common case (escape-free ASCII strings) skips the
    # byte-by-byte state machine entirely
    close = buf.find(b")", pos + 1)
    if close != -1:
        body = buf[pos + 1:close]
        if b"\\" not in body and b"(" not in body:
            return body, close + 1
    out = bytearray()
    i = pos + 1
    nest = 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= buf[i] <= 0x37:
                    oct_digits.append(buf[i])
                    i += 1
                out.append(int(bytes(oct_digits), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:  # unknown escape: char stands for itself
                out.append(e)
                i += 1
        elif c == 0x28:
            nest += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            nest -= 1
            if nest == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated literal string")


def _parse_hex_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    end = buf.find(b">", pos + 1)
    if end == -1:
        raise ValueError("unterminated hex string")
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", buf[pos + 1:end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


def tokenize_content(stream: bytes):
    """Yield ``("num", float) | ("str", bytes) | ("name", bytes) |
    ("arr", list) | ("op", bytes)`` tokens from a content stream."""
    i = 0
    n = len(stream)
    arr_stack: list[list[Any]] = []

    def emit(tok):
        if arr_stack:
            arr_stack[-1].append(tok)
            return None
        return tok

    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment → end of line
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
            continue
        if c == 0x5B:  # [
            arr_stack.append([])
            i += 1
            continue
        if c == 0x5D:  # ]
            arr = arr_stack.pop() if arr_stack else []
            t = emit(("arr", arr))
            if t:
                yield t
            i += 1
            continue
        if c == 0x28:  # (
            s, i = _parse_literal_string(stream, i)
            t = emit(("str", s))
            if t:
                yield t
            continue
        if c == 0x3C:  # < — hex string (<< never appears in content text ops)
            if stream[i:i + 2] == b"<<":
                # inline dict (e.g. BDC property lists) — skip balanced
                _d, i = _match_dict(stream, i)
                continue
            s, i = _parse_hex_string(stream, i)
            t = emit(("str", s))
            if t:
                yield t
            continue
        if c == 0x2F:  # /Name
            m = _NAME_RE.match(stream, i)
            t = emit(("name", m.group(0)))
            if t:
                yield t
            i = m.end()
            continue
        m = _NUM_RE.match(stream, i)
        if m:
            t = emit(("num", float(m.group(0))))
            if t:
                yield t
            i = m.end()
            continue
        m = _OP_RE.match(stream, i)
        if m:
            yield ("op", m.group(0))
            i = m.end()
            continue
        i += 1  # unknown byte — tolerate


def parse_tounicode(data: bytes) -> dict:
    """/ToUnicode CMap (ISO 32000 §9.10.3) → ``{"width": n, "map":
    {code: str}}``. Handles begincodespacerange (code byte width),
    bfchar pairs and bfrange (incrementing-destination and array
    forms); destinations are UTF-16BE hex strings."""
    width = 1
    m = re.search(rb"begincodespacerange\s*<([0-9a-fA-F]+)>", data)
    if m:
        width = max(1, len(m.group(1)) // 2)
    cmap: dict[int, str] = {}

    def _u(hexs: bytes) -> str:
        try:
            return bytes.fromhex(hexs.decode()).decode("utf-16-be")
        except (ValueError, UnicodeDecodeError):
            return "�"

    for block in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
                rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>", block):
            cmap[int(src, 16)] = _u(dst)
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for lo, hi, dst in re.findall(
                rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*"
                rb"(<[0-9a-fA-F]+>|\[[^\]]*\])", block):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i - lo_i > 65535:
                raise ValueError("oversized bfrange")
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9a-fA-F]+)>", dst)
                for k, d in enumerate(dsts[:hi_i - lo_i + 1]):
                    cmap[lo_i + k] = _u(d)
            else:
                base = int(dst[1:-1], 16)
                nhex = len(dst) - 2
                for k in range(hi_i - lo_i + 1):
                    cmap[lo_i + k] = _u(b"%0*x" % (nhex, base + k))
    return {"width": width, "map": cmap}


def page_fonts(objects: dict[int, tuple[bytes, bytes | None]],
               page_dct: bytes) -> dict[bytes, dict | None]:
    """Per-page ``/Resources /Font`` → ``{b"/F1": cmap-or-None}``; fonts
    with a /ToUnicode stream get their parsed CMap."""
    res = page_dct
    rm = re.search(rb"/Resources\s+(\d+)\s+0\s+R", page_dct)
    if rm and int(rm.group(1)) in objects:
        res = objects[int(rm.group(1))][0]
    fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
    fonts: dict[bytes, dict | None] = {}
    if not fm:
        return fonts
    for name, oid in re.findall(rb"(/\w+)\s+(\d+)\s+0\s+R", fm.group(1)):
        fdct = objects.get(int(oid), (b"", None))[0]
        cmap = None
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", fdct)
        if tm:
            cdct, cstream = objects.get(int(tm.group(1)), (b"", None))
            if cstream is not None:
                cmap = parse_tounicode(decode_stream(cdct, cstream))
        fonts[name] = cmap
    return fonts


def text_runs(stream: bytes,
              fonts: dict[bytes, dict | None] | None = None
              ) -> list[tuple[float, float, float, str]]:
    """Execute the text-positioning subset → ``[(x, y, size, text)]``
    runs. When ``fonts`` is given, show-operator bytes route through the
    current font's /ToUnicode CMap (code width from its codespace);
    unmapped codes fall back to the byte's Latin-1 character."""
    runs: list[tuple[float, float, float, str]] = []
    stack: list[Any] = []
    x = y = 0.0
    lx = ly = 0.0     # line matrix origin (Td is relative to line start)
    size = 12.0
    leading = 0.0
    in_text = False
    cur_cmap: dict | None = None

    def show(raw: bytes) -> None:
        if cur_cmap is not None:
            w = cur_cmap["width"]
            mp = cur_cmap["map"]
            chars = []
            for i in range(0, len(raw) - (w - 1), w):
                code = int.from_bytes(raw[i:i + w], "big")
                chars.append(mp.get(code, chr(code) if code < 256
                                    else "�"))
            text = "".join(chars)
        else:
            text = raw.decode("utf-8", errors="replace")
        if text:
            runs.append((x, y, size, text))

    for kind, val in tokenize_content(stream):
        if kind != "op":
            stack.append((kind, val))
            continue
        op = val
        try:
            if op == b"BT":
                in_text = True
                x = y = lx = ly = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(stack) >= 1 and stack[-1][0] == "num":
                size = float(stack[-1][1])
                if fonts is not None and len(stack) >= 2 \
                        and stack[-2][0] == "name":
                    cur_cmap = fonts.get(stack[-2][1])
            elif op == b"TL" and stack and stack[-1][0] == "num":
                leading = float(stack[-1][1])
            elif op == b"Td" and len(stack) >= 2:
                lx += float(stack[-2][1])
                ly += float(stack[-1][1])
                x, y = lx, ly
            elif op == b"TD" and len(stack) >= 2:
                leading = -float(stack[-1][1])
                lx += float(stack[-2][1])
                ly += float(stack[-1][1])
                x, y = lx, ly
            elif op == b"Tm" and len(stack) >= 6:
                lx = float(stack[-2][1])
                ly = float(stack[-1][1])
                x, y = lx, ly
            elif op == b"T*":
                ly -= leading
                x, y = lx, ly
            elif op == b"Tj" and in_text and stack and stack[-1][0] == "str":
                show(stack[-1][1])
            elif op == b"'" and in_text and stack and stack[-1][0] == "str":
                ly -= leading
                x, y = lx, ly
                show(stack[-1][1])
            elif op == b'"' and in_text and stack and stack[-1][0] == "str":
                ly -= leading
                x, y = lx, ly
                show(stack[-1][1])
            elif op == b"TJ" and in_text and stack and stack[-1][0] == "arr":
                parts = [e[1] for e in stack[-1][1] if e[0] == "str"]
                show(b"".join(parts))
        finally:
            stack.clear()
    return runs


PAGE_H_DEFAULT = 792.0
_Y_TOL = 1.0


def assemble_page_text(
    runs: list[tuple[float, float, float, str]],
    *, page_height: float = PAGE_H_DEFAULT, bbox_scale: float = 2.0,
) -> tuple[str, list[dict[str, Any]]]:
    """Reading-order assembly: group runs into lines by y, top-first."""
    if not runs:
        return "", []
    ordered = sorted(runs, key=lambda r: (-r[1], r[0]))
    lines: list[list[tuple[float, float, float, str]]] = []
    for r in ordered:
        if lines and abs(lines[-1][0][1] - r[1]) <= _Y_TOL:
            lines[-1].append(r)
        else:
            lines.append([r])
    texts: list[str] = []
    boxes: list[dict[str, Any]] = []
    for line in lines:
        texts.append(" ".join(r[3] for r in line))
        for rx, ry, rsize, rtext in line:
            cx = rx
            for word in rtext.split(" "):
                w = 0.6 * rsize * len(word)
                if word:
                    boxes.append({
                        "text": word,
                        "x0": cx * bbox_scale,
                        "y0": (page_height - ry - rsize) * bbox_scale,
                        "x1": (cx + w) * bbox_scale,
                        "y1": (page_height - ry) * bbox_scale,
                        "conf": 1.0,
                    })
                cx += w + 0.6 * rsize  # word + single-space advance
    return "\n".join(texts), boxes


def page_images(pdf: bytes, password: bytes = b""):
    """Per-page decoded /DeviceGray Image XObjects → list (page order) of
    lists of uint8 (h, w) arrays (empty list for text-only pages). The
    image half of the mixed-PDF round-trip oracle (`pdfwrite.mixed_pdf`).
    8-bit grayscale XObjects decode raw, through the standard filter
    chains (Flate/LZW/A85/AHx/RL via :func:`decode_stream`), or as
    embedded JPEG (`/DCTDecode` → the engine's general T.81 decoder,
    color reducing to BT.601 luma — the scanner/img2pdf layout);
    bilevel CCITT G3/G4 and JBIG2 generic-region XObjects decode
    through the same packed-bit path; JPXDecode routes to the
    engine's restricted lossless JPEG 2000 decoder."""
    import numpy as np

    objects = parse_objects(pdf, password)
    tm = re.search(rb"/Root\s+(\d+)\s+0\s+R", pdf)
    kids: list[int] = []
    if tm and int(tm.group(1)) in objects:
        for pid in _ref_list(objects[int(tm.group(1))][0], rb"/Pages"):
            stack = [pid]
            while stack:
                nid = stack.pop(0)
                dct = objects.get(nid, (b"", None))[0]
                if b"/Type /Pages" in dct or b"/Type/Pages" in dct:
                    stack = _ref_list(dct, rb"/Kids") + stack
                else:
                    kids.append(nid)
    if not kids:
        raise ValueError("no pages")
    out = []
    for pid in kids:
        dct = objects.get(pid, (b"", None))[0]
        imgs = []
        xm = re.search(rb"/XObject\s*<<(.*?)>>", dct, re.S)
        if xm:
            for oid in re.findall(rb"(\d+)\s+0\s+R", xm.group(1)):
                xd, xs = objects.get(int(oid), (b"", None))
                if b"/Subtype /Image" not in xd and b"/Subtype/Image" not in xd:
                    continue
                wm = re.search(rb"/Width\s+(\d+)", xd)
                hm = re.search(rb"/Height\s+(\d+)", xd)
                if not (wm and hm) or xs is None:
                    raise ValueError("malformed image XObject")
                w, h = int(wm.group(1)), int(hm.group(1))
                if re.search(rb"/Filter\s*\[?\s*/(?:DCTDecode|DCT)\b", xd):
                    from documentai_ray.functions.minijpeg import \
                        decode_gray_jpeg

                    img = decode_gray_jpeg(xs)
                    if img.shape != (h, w):
                        raise ValueError("DCT image dimension mismatch")
                    imgs.append(img)
                    continue
                if re.search(rb"/Filter\s*\[?\s*/JPXDecode\b", xd):
                    from documentai_ray.functions.jp2k import decode_jp2k

                    img = decode_jp2k(xs)
                    if img.shape[:2] != (h, w):
                        raise ValueError("JPX image dimension mismatch")
                    if img.ndim == 3:
                        # BT.601 luma reduction, same convention as the
                        # DCT color path (and png_color_roundtrip)
                        p32 = img.astype(np.int64)
                        img = ((299 * p32[:, :, 0] + 587 * p32[:, :, 1]
                                + 114 * p32[:, :, 2] + 500) // 1000
                               ).astype(np.uint8)
                    imgs.append(img)
                    continue
                if b"/ColorSpace /DeviceGray" not in xd:
                    raise ValueError("unsupported image encoding")
                if b"/BitsPerComponent 1" in xd:
                    # bilevel (incl. CCITTFaxDecode → packed rows);
                    # DeviceGray 1-bit: sample 1 = 1.0 = white
                    data = decode_stream(xd, xs, objects)
                    row_bytes = (w + 7) // 8
                    if len(data) < row_bytes * h:
                        raise ValueError("bilevel image length mismatch")
                    packed = np.frombuffer(data[:row_bytes * h],
                                           np.uint8).reshape(h, row_bytes)
                    bits = np.unpackbits(packed, axis=1)[:, :w]
                    imgs.append((bits * 255).astype(np.uint8))
                    continue
                if b"/BitsPerComponent 8" not in xd:
                    raise ValueError("unsupported image encoding")
                data = decode_stream(xd, xs, objects)
                if len(data) != w * h:
                    raise ValueError("image length mismatch")
                imgs.append(np.frombuffer(data, np.uint8).reshape(h, w))
        out.append(imgs)
    return out


_INFO_KEYS = (b"Title", b"Author", b"Subject", b"Producer", b"Creator",
              b"Keywords")


def document_info(pdf: bytes,
                  password: bytes = b"") -> dict[str, str]:
    """``/Info`` dictionary metadata (ISO 32000 §14.3.3): Title / Author
    / Subject / Producer / Creator / Keywords as text. Handles literal
    strings (with escapes) and hex strings, UTF-16BE-with-BOM or
    PDFDocEncoding≈latin-1 per the spec's text-string rules. Returns
    only the keys present."""
    if not is_pdf(pdf):
        raise ValueError("not a PDF payload")
    objects = parse_objects(pdf, password)
    im = re.search(rb"/Info\s+(\d+)\s+0\s+R", pdf)
    if not im or int(im.group(1)) not in objects:
        return {}
    dct = objects[int(im.group(1))][0]
    out: dict[str, str] = {}
    for key in _INFO_KEYS:
        m = re.search(rb"/" + key + rb"\s*(\(|<)", dct)
        if not m:
            continue
        pos = m.end() - 1
        if dct[pos:pos + 1] == b"(":
            raw, _end = _parse_literal_string(dct, pos)
        else:
            raw, _end = _parse_hex_string(dct, pos)
        if raw.startswith(b"\xfe\xff"):
            text = raw[2:].decode("utf-16-be", errors="replace")
        else:
            text = raw.decode("latin-1")
        out[key.decode()] = text
    return out


def document_outline(pdf: bytes,
                     password: bytes = b"") -> list[str]:
    """Bookmark (outline/TOC) titles in document order (ISO 32000
    §12.3.3): walk /Root → /Outlines → /First → /Next chains, depth-
    first (children before the next sibling). Cycle-guarded; returns []
    when the document has no outline."""
    if not is_pdf(pdf):
        raise ValueError("not a PDF payload")
    objects = parse_objects(pdf, password)
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", pdf)
    if not rm or int(rm.group(1)) not in objects:
        return []
    root = objects[int(rm.group(1))][0]
    om = re.search(rb"/Outlines\s+(\d+)\s+0\s+R", root)
    if not om or int(om.group(1)) not in objects:
        return []

    titles: list[str] = []
    seen: set[int] = set()

    def _title(dct: bytes) -> str | None:
        m = re.search(rb"/Title\s*(\(|<)", dct)
        if not m:
            return None
        pos = m.end() - 1
        if dct[pos:pos + 1] == b"(":
            raw, _ = _parse_literal_string(dct, pos)
        else:
            raw, _ = _parse_hex_string(dct, pos)
        if raw.startswith(b"\xfe\xff"):
            return raw[2:].decode("utf-16-be", errors="replace")
        return raw.decode("latin-1")

    def _walk(num: int) -> None:
        while num and num not in seen and num in objects:
            seen.add(num)
            dct = objects[num][0]
            t = _title(dct)
            if t is not None:
                titles.append(t)
            fm = re.search(rb"/First\s+(\d+)\s+0\s+R", dct)
            if fm:
                _walk(int(fm.group(1)))
            nm = re.search(rb"/Next\s+(\d+)\s+0\s+R", dct)
            num = int(nm.group(1)) if nm else 0

    top = objects[int(om.group(1))][0]
    fm = re.search(rb"/First\s+(\d+)\s+0\s+R", top)
    if fm:
        _walk(int(fm.group(1)))
    return titles


def document_links(pdf: bytes,
                   password: bytes = b"") -> list[str]:
    """Outbound URIs from link annotations (ISO 32000 §12.5.6.5 /Link +
    §12.6.4.7 /URI actions), page order then annotation order — the
    PDF side of outlink extraction (crawl frontiers follow PDF links
    too). Handles direct and indirect annotation objects."""
    if not is_pdf(pdf):
        raise ValueError("not a PDF payload")
    objects = parse_objects(pdf, password)
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", pdf)
    kids: list[int] = []
    if rm and int(rm.group(1)) in objects:
        for pid in _ref_list(objects[int(rm.group(1))][0], rb"/Pages"):
            stack = [pid]
            while stack:
                nid = stack.pop(0)
                dct = objects.get(nid, (b"", None))[0]
                if b"/Type /Pages" in dct or b"/Type/Pages" in dct:
                    stack = _ref_list(dct, rb"/Kids") + stack
                else:
                    kids.append(nid)
    out: list[str] = []

    def _uris(dct: bytes) -> None:
        # literal OR hex /URI strings (decrypted strings re-embed as hex)
        for m in re.finditer(rb"/URI\s*(\(|<)", dct):
            if m.group(1) == b"(":
                raw, _ = _parse_literal_string(dct, m.end() - 1)
            else:
                raw, _ = _parse_hex_string(dct, m.end() - 1)
            out.append(raw.decode("utf-8", errors="replace"))

    for pid in kids:
        dct = objects.get(pid, (b"", None))[0]
        am = re.search(rb"/Annots\s*\[([^\]]*)\]", dct)
        if not am:
            continue
        body = am.group(1)
        _uris(body)  # direct annotation dicts inside the array
        for oid in re.findall(rb"(\d+)\s+0\s+R", body):
            _uris(objects.get(int(oid), (b"", None))[0])
    return out


def extract_text(pdf: bytes, *, max_pages: int | None = None,
                 bbox_scale: float = 2.0, password: bytes = b""
                 ) -> tuple[str, list[dict[str, Any]]]:
    """``%PDF-`` payload → ``(text, word_boxes)`` per the canonical spec.

    Raises ``ValueError`` on structural damage (caller degrades to an
    error row). ``max_pages`` mirrors the reference's page cap
    (documentClassifier.py:1369)."""
    if not is_pdf(pdf):
        raise ValueError("not a PDF payload")
    pages = page_contents_and_fonts(pdf, password=password)
    if max_pages is not None:
        pages = pages[:max_pages]
    page_texts: list[str] = []
    boxes: list[dict[str, Any]] = []
    for page_num, (stream, fonts) in enumerate(pages, start=1):
        text, pboxes = assemble_page_text(text_runs(stream, fonts),
                                          bbox_scale=bbox_scale)
        page_texts.append(text)
        for b in pboxes:
            b["page"] = page_num
        boxes.extend(pboxes)
    return "\n".join(page_texts), boxes
