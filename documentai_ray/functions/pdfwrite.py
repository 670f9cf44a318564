"""Real ISO-32000 PDF writer for the images→PDF sink (K2) and the
text-document path (S1/M1 real-format loop).

The reference's images→PDF endpoint re-bundles page images into one PDF
(`img2pdf` behind its FastAPI surface). `img2pdf`/PIL aren't in this
container, but a minimal PDF is just a byte layout — this writer emits a
GENUINE PDF 1.4 file any conforming viewer opens: one page per grayscale
image, each page an uncompressed 8-bit /DeviceGray Image XObject drawn
1:1 via a `cm` matrix, with a correct xref table (byte-exact offsets)
and trailer. Deterministic output: same images → same bytes.

`text_to_pdf` is the TEXT counterpart: genuine PDF 1.4 text objects
(`BT /F1 12 Tf x y Td (…) Tj ET`, uncompressed content streams,
Helvetica base font) — one text-showing run per layout line, emitted in
ROTATED stream order so an extractor only reproduces the document if its
reading-order sort (by position, not stream order) is correct. Paired
with `functions/pdfread.py`, this closes the real-`%PDF-` extraction
loop the reference runs through `fitz.open` + `page.get_text()`
(/root/reference/microservices/entity-extraction-service/app.py:515-533).

`validate()` re-parses the xref and checks every object really starts at
its recorded offset, and round-trips the raw image bytes back out — the
writer's own proof of well-formedness (pytest golden)."""

from __future__ import annotations

import re

import numpy as np


def images_to_pdf(images: list[np.ndarray], *,
                  image_filter: str = "none") -> bytes:
    """Grayscale uint8 (h, w) arrays → one PDF page per image.

    ``image_filter``: "none" (raw samples, the engine's classic layout),
    "flate" (`/Filter /FlateDecode` — the common lossless embed), or
    "dct" (`/Filter /DCTDecode` — a REAL embedded JPEG, what scanners
    and img2pdf produce)."""
    objs: list[bytes] = []  # object bodies, 1-indexed as 1..len(objs)

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    n = len(images)
    # obj 1: catalog, obj 2: pages (kids filled after page objs exist)
    add(b"")  # placeholder catalog
    add(b"")  # placeholder pages
    kid_ids: list[int] = []
    for img in images:
        h, w = img.shape[:2]
        if img.ndim == 3 and image_filter not in ("jpx", "jpx_lossy"):
            raise ValueError(
                "color images require image_filter='jpx'/'jpx_lossy'")
        if image_filter == "none":
            raw = img.tobytes()
            filt = b""
        elif image_filter == "flate":
            import zlib

            raw = zlib.compress(img.tobytes(), 6)
            filt = b" /Filter /FlateDecode"
        elif image_filter == "dct":
            from documentai_ray.functions.jpegdec import encode_jpeg

            raw = encode_jpeg(img)
            filt = b" /Filter /DCTDecode"
        elif image_filter == "g4":
            from documentai_ray.functions.faxg4 import g4_encode

            # ink = dark; BlackIs1 false → black sample is 0 (DeviceGray)
            raw = g4_encode(img < 128)
            filt = (b" /Filter /CCITTFaxDecode /DecodeParms"
                    b" << /K -1 /Columns %d /Rows %d /BlackIs1 false >>"
                    % (w, h))
        elif image_filter == "jpx":
            from documentai_ray.functions.jp2k import encode_jp2k

            # lossless reversible-5/3 J2K codestream; JPX streams carry
            # their own geometry/depth, the dict repeats them per PDF
            raw = encode_jp2k(img, levels=2)
            filt = b" /Filter /JPXDecode"
        elif image_filter == "jpx_lossy":
            from documentai_ray.functions.jp2k import encode_jp2k_lossy

            # irreversible 9/7 (what wild lossy JPX scans actually use)
            raw = encode_jp2k_lossy(img, levels=2)
            filt = b" /Filter /JPXDecode"
        elif image_filter.startswith("jbig2"):
            from documentai_ray.functions.jbig2 import jbig2_encode

            # JBIG2 wire: 1 = black (no BlackIs1 parm exists); the
            # reader inverts to the packed 1=white bilevel convention.
            # Variants: _mmr (T.6 region), _striped (§7.4.8.2 page
            # stripes), _t1/_t2/_t3 (GB context templates)
            kw = {}
            if image_filter == "jbig2_mmr":
                kw["mmr"] = True
            elif image_filter == "jbig2_striped":
                kw["stripe_h"] = 16
            elif image_filter in ("jbig2_t1", "jbig2_t2", "jbig2_t3"):
                kw["template"] = int(image_filter[-1])
            elif image_filter != "jbig2":
                raise ValueError(f"unknown image_filter {image_filter}")
            raw = jbig2_encode(img < 128, **kw)
            filt = b" /Filter /JBIG2Decode"
        elif image_filter in ("g3", "g3_2d"):
            from documentai_ray.functions.faxg4 import g3_encode

            # Group 3: K=0 pure 1-D MH, K=4 mixed MR (the classic fine-
            # resolution fax K); EOL-framed, so /EndOfLine true
            g3k = 0 if image_filter == "g3" else 4
            raw = g3_encode(img < 128, k=g3k)
            filt = (b" /Filter /CCITTFaxDecode /DecodeParms"
                    b" << /K %d /Columns %d /Rows %d /BlackIs1 false"
                    b" /EndOfLine true >>" % (g3k, w, h))
        else:
            raise ValueError(f"unknown image_filter {image_filter}")
        bpc = (1 if image_filter in ("g4", "g3", "g3_2d")
               or image_filter.startswith("jbig2") else 8)
        cspace = b"/DeviceRGB" if img.ndim == 3 else b"/DeviceGray"
        im_id = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace %s /BitsPerComponent %d%s /Length %d >>\n"
            b"stream\n%s\nendstream" % (w, h, cspace, bpc, filt,
                                         len(raw), raw))
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
        pg_id = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /XObject << /Im0 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (w, h, im_id, ct_id))
        kid_ids.append(pg_id)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (b" ".join(b"%d 0 R" % k for k in kid_ids), n))

    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)


PAGE_W, PAGE_H = 612, 792          # US-Letter, the reference's default raster
TEXT_X, TEXT_TOP, LEADING = 72, 720, 14
FONT_SIZE = 12


def escape_pdf_string(s: str) -> bytes:
    """Literal-string escaping per ISO 32000 §7.3.4.2: backslash, parens;
    non-Latin-1 code points ship as octal-escaped UTF-8 bytes (the parser
    reverses both)."""
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x5C, 0x28, 0x29):  # \ ( )
            out += b"\\" + bytes([b])
        elif 32 <= b < 127 or b in (0x0A, 0x0D, 0x09):
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def jbig2_text_pdf(symbols, placements, page_w: int,
                   page_h: int, *, huffman: bool = False,
                   mmr_collective: bool = False,
                   refagg: bool = False) -> bytes:
    """One-page PDF whose page image is a JBIG2 SYMBOL-CODED text
    region — the wire shape real scanners emit for text pages: a
    symbol dictionary of glyph bitmaps plus (S, T, ID) instance
    placements, embedded as a 1-bit /JBIG2Decode image XObject.
    ``huffman=True`` emits the SDHUFF/SBHUFF variant (optionally with
    MMR-coded collective bitmaps) instead of arithmetic coding."""
    import numpy as np  # noqa: F401

    from documentai_ray.functions.jbig2 import encode_symbol_text_page

    raw = encode_symbol_text_page(symbols, placements, page_w, page_h,
                                  huffman=huffman,
                                  mmr_collective=mmr_collective,
                                  refagg=refagg)
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    add(b"")  # catalog placeholder
    add(b"")  # pages placeholder
    im_id = add(
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /ColorSpace /DeviceGray /BitsPerComponent 1"
        b" /Filter /JBIG2Decode /Length %d >>\n"
        b"stream\n%s\nendstream" % (page_w, page_h, len(raw), raw))
    content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (page_w, page_h)
    ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(content), content))
    pg_id = add(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
        b" /Resources << /XObject << /Im0 %d 0 R >> >>"
        b" /Contents %d 0 R >>" % (page_w, page_h, im_id, ct_id))
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % pg_id)
    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d"
            b"\n%%%%EOF\n" % (len(objs) + 1, xref_at))
    return bytes(out)


def jbig2_globals_pdf(symbols, pages, *, huffman: bool = False) -> bytes:
    """Multi-page PDF in the STANDARD wild scanner layout (ISO 32000
    §7.4.7): ONE shared JBIG2 symbol dictionary in a JBIG2Globals
    stream object, and per-page 1-bit /JBIG2Decode image XObjects whose
    ``/DecodeParms << /JBIG2Globals N 0 R >>`` reference it.

    ``symbols``: shared bool glyph bitmaps; ``pages``: list of
    (placements, page_w, page_h). The globals stream is emitted
    Flate-compressed — wild writers compress it, and decoding it must
    itself run the filter chain."""
    import zlib

    from documentai_ray.functions.jbig2 import encode_symbol_text_globals

    glob, streams = encode_symbol_text_globals(symbols, pages,
                                                huffman=huffman)
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    add(b"")  # catalog placeholder
    add(b"")  # pages placeholder
    gz = zlib.compress(glob, 6)
    glob_id = add(b"<< /Filter /FlateDecode /Length %d >>\n"
                  b"stream\n%s\nendstream" % (len(gz), gz))
    kid_ids: list[int] = []
    for raw, (_pl, page_w, page_h) in zip(streams, pages):
        im_id = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace /DeviceGray /BitsPerComponent 1"
            b" /Filter /JBIG2Decode"
            b" /DecodeParms << /JBIG2Globals %d 0 R >>"
            b" /Length %d >>\n"
            b"stream\n%s\nendstream"
            % (page_w, page_h, glob_id, len(raw), raw))
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (page_w, page_h)
        ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
        kid_ids.append(add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /XObject << /Im0 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (page_w, page_h, im_id, ct_id)))
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (b" ".join(b"%d 0 R" % k for k in kid_ids),
                  len(kid_ids)))
    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d"
            b"\n%%%%EOF\n" % (len(objs) + 1, xref_at))
    return bytes(out)


def text_to_pdf(lines: list[str], *, lines_per_page: int = 40,
                shuffle_key: int = 0, compress: bool = False,
                info: dict[str, str] | None = None,
                outline: list[str] | None = None,
                links: list[str] | None = None) -> bytes:
    """Text lines → genuine PDF 1.4, one `Tj` run per line.

    Line ``i`` of a page sits at ``(72, 720 − 14·i)`` in PDF user space
    (origin bottom-left). The per-page emission order of the `BT…ET`
    blocks is rotated by ``shuffle_key + page_index`` — stream order ≠
    reading order, so `pdfread.extract_text` must sort by position.
    ``compress=True`` deflates content streams (`/Filter /FlateDecode`)
    to exercise the parser's inflate path. Deterministic bytes."""
    import zlib

    page_lines = [lines[i:i + lines_per_page]
                  for i in range(0, len(lines), lines_per_page)] or [[]]
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    add(b"")  # 1: catalog placeholder
    add(b"")  # 2: pages placeholder
    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    kid_ids: list[int] = []
    for pi, plines in enumerate(page_lines):
        chunks: list[bytes] = []
        for li, line in enumerate(plines):
            y = TEXT_TOP - LEADING * li
            chunks.append(b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
                          % (FONT_SIZE, TEXT_X, y, escape_pdf_string(line)))
        rot = (shuffle_key + pi) % max(1, len(chunks))
        chunks = chunks[rot:] + chunks[:rot]
        content = b"\n".join(chunks)
        if compress:
            data = zlib.compress(content, 6)
            ct_id = add(b"<< /Length %d /Filter /FlateDecode >>\n"
                        b"stream\n%s\nendstream" % (len(data), data))
        else:
            ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                        % (len(content), content))
        annots_ref = b""
        if links and pi == 0:
            ann_ids = []
            for li2, url in enumerate(links):
                y0 = TEXT_TOP - LEADING * li2
                ann_ids.append(add(
                    b"<< /Type /Annot /Subtype /Link"
                    b" /Rect [%d %d %d %d] /Border [0 0 0]"
                    b" /A << /S /URI /URI (%s) >> >>"
                    % (TEXT_X, y0 - 2, TEXT_X + 200, y0 + 10,
                       escape_pdf_string(url))))
            annots_ref = (b" /Annots [%s]"
                          % b" ".join(b"%d 0 R" % a for a in ann_ids))
        pg_id = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 %d 0 R >> >>%s"
            b" /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, font_id, annots_ref, ct_id))
        kid_ids.append(pg_id)
    catalog_extra = b""
    if outline:
        # flat one-level outline: /Outlines root + /First..Next chain
        first_item = len(objs) + 2  # after the outlines root object
        root_id = len(objs) + 1
        items = []
        for i, title in enumerate(outline):
            prev_ref = (b" /Prev %d 0 R" % (first_item + i - 1)
                        if i else b"")
            next_ref = (b" /Next %d 0 R" % (first_item + i + 1)
                        if i + 1 < len(outline) else b"")
            items.append(
                b"<< /Title (%s) /Parent %d 0 R%s%s"
                b" /Dest [%d 0 R /Fit] >>"
                % (escape_pdf_string(title), root_id, prev_ref, next_ref,
                   kid_ids[min(i, len(kid_ids) - 1)]))
        add(b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
            % (first_item, first_item + len(outline) - 1, len(outline)))
        for it in items:
            add(it)
        catalog_extra = b" /Outlines %d 0 R" % root_id
    objs[0] = (b"<< /Type /Catalog /Pages 2 0 R%s >>" % catalog_extra)
    objs[1] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (b" ".join(b"%d 0 R" % k for k in kid_ids), len(kid_ids)))
    info_ref = b""
    if info:
        body = b"<< " + b" ".join(
            b"/%s (%s)" % (k.encode("ascii"), escape_pdf_string(v))
            for k, v in sorted(info.items())) + b" >>"
        info_ref = b" /Info %d 0 R" % add(body)

    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, info_ref, xref_at))
    return bytes(out)


def escape_pdf_bytes(raw: bytes) -> bytes:
    """Literal-string escaping for raw code bytes (no UTF-8 pass)."""
    out = bytearray()
    for b in raw:
        if b in (0x5C, 0x28, 0x29):
            out += b"\\" + bytes([b])
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def text_to_pdf_cmap(lines: list[str], *, lines_per_page: int = 40,
                     shuffle_key: int = 0) -> bytes:
    """Text lines → PDF whose strings use a CUSTOM single-byte encoding
    resolvable ONLY through the font's /ToUnicode CMap (the wild
    subset-font layout): each distinct character maps to an arbitrary
    code (1..n by first appearance), and the CMap mixes bfchar entries,
    single-code bfranges and an array-form bfrange so every ISO 32000
    §9.10.3 construct is exercised. Same page geometry as
    :func:`text_to_pdf`, so extraction output must be identical —
    byte-identity through the CMap is the contract."""
    import zlib

    page_lines = [lines[i:i + lines_per_page]
                  for i in range(0, len(lines), lines_per_page)] or [[]]
    charset: dict[str, int] = {}
    for ln in lines:
        for ch in ln:
            if ch != " " and ch not in charset:
                charset[ch] = len(charset) + 1
    if len(charset) > 254:
        raise ValueError("custom 1-byte encoding overflows")
    space_code = len(charset) + 1

    def enc_line(ln: str) -> bytes:
        return bytes(space_code if ch == " " else charset[ch]
                     for ch in ln)

    # ToUnicode CMap: first third as bfchar, next as 1-code bfranges,
    # the rest as one array-form bfrange (plus the space code)
    items = sorted(charset.items(), key=lambda kv: kv[1])
    items.append((" ", space_code))
    third = max(1, len(items) // 3)
    parts = [b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
             b"begincmap\n/CMapName /GraftCustom def\n/CMapType 2 def\n"
             b"1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"]
    bfchars = items[:third]
    parts.append(b"%d beginbfchar\n" % len(bfchars))
    for ch, code in bfchars:
        parts.append(b"<%02x> <%s>\n"
                     % (code, ch.encode("utf-16-be").hex().encode()))
    parts.append(b"endbfchar\n")
    singles = items[third:2 * third]
    if singles:
        parts.append(b"%d beginbfrange\n" % len(singles))
        for ch, code in singles:
            parts.append(b"<%02x> <%02x> <%s>\n"
                         % (code, code,
                            ch.encode("utf-16-be").hex().encode()))
        parts.append(b"endbfrange\n")
    rest = items[2 * third:]
    if rest:
        # array form covers a contiguous code span (codes are assigned
        # densely, so rest is contiguous)
        lo = rest[0][1]
        hi = rest[-1][1]
        arr = b" ".join(b"<%s>"
                        % ch.encode("utf-16-be").hex().encode()
                        for ch, _c in rest)
        parts.append(b"1 beginbfrange\n<%02x> <%02x> [%s]\nendbfrange\n"
                     % (lo, hi, arr))
    parts.append(b"endcmap\nCMapName currentdict /CMap defineresource "
                 b"pop\nend\nend\n")
    cmap_payload = b"".join(parts)

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    add(b"")  # 1: catalog
    add(b"")  # 2: pages
    zdata = zlib.compress(cmap_payload, 6)
    cmap_id = add(b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\n"
                  b"endstream" % (len(zdata), zdata))
    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont "
                  b"/GraftCustom /ToUnicode %d 0 R >>" % cmap_id)
    kid_ids: list[int] = []
    for pi, plines in enumerate(page_lines):
        chunks: list[bytes] = []
        for li, line in enumerate(plines):
            y = TEXT_TOP - LEADING * li
            chunks.append(b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
                          % (FONT_SIZE, TEXT_X, y,
                             escape_pdf_bytes(enc_line(line))))
        rot = (shuffle_key + pi) % max(1, len(chunks))
        chunks = chunks[rot:] + chunks[:rot]
        content = b"\n".join(chunks)
        ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
        pg_id = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (PAGE_W, PAGE_H, font_id, ct_id))
        kid_ids.append(pg_id)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (b" ".join(b"%d 0 R" % k for k in kid_ids),
                  len(kid_ids)))
    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def ascii85_encode(data: bytes) -> bytes:
    """ASCII85 per ISO 32000 §7.4.3 (with the `z` shortcut and `~>`
    EOD), the encoder mate of pdfread's decoder."""
    out = bytearray()
    for i in range(0, len(data) - 3, 4):
        v = int.from_bytes(data[i:i + 4], "big")
        if v == 0:
            out += b"z"
            continue
        grp = bytearray(5)
        for j in range(4, -1, -1):
            grp[j] = 0x21 + v % 85
            v //= 85
        out += grp
    rem = len(data) % 4
    if rem:
        v = int.from_bytes(data[-rem:] + b"\x00" * (4 - rem), "big")
        grp = bytearray(5)
        for j in range(4, -1, -1):
            grp[j] = 0x21 + v % 85
            v //= 85
        out += grp[:rem + 1]
    return bytes(out) + b"~>"


def text_to_pdf_modern(lines: list[str], *, lines_per_page: int = 40,
                       shuffle_key: int = 0,
                       content_filter: str = "lzw") -> bytes:
    """Text lines → PDF 1.5-style file: the non-stream objects (catalog,
    page tree, page dicts, font) are packed into a `/Type /ObjStm`
    object stream (FlateDecode), content streams are compressed with a
    doc-selectable filter chain, and the file ends with a `/Type /XRef`
    cross-reference STREAM (type-1/type-2 entries, PNG Up predictor) —
    no classic `xref` table or `trailer` at all. Same page geometry and
    rotated stream order as :func:`text_to_pdf`, so extraction output is
    identical.

    content_filter: "lzw" (`/LZWDecode`, TIFF early-change variant),
    "a85flate" (`/Filter [/ASCII85Decode /FlateDecode]` chain),
    "rl" (`/RunLengthDecode`), or "hexflate"
    (`/Filter [/ASCIIHexDecode /FlateDecode]`)."""
    import zlib

    from documentai_ray.functions.minitiff import lzw_encode

    page_lines = [lines[i:i + lines_per_page]
                  for i in range(0, len(lines), lines_per_page)] or [[]]

    def content_obj(content: bytes) -> bytes:
        if content_filter == "lzw":
            data = lzw_encode(content)
            filt = b"/Filter /LZWDecode"
        elif content_filter == "a85flate":
            data = ascii85_encode(zlib.compress(content, 6))
            filt = b"/Filter [/ASCII85Decode /FlateDecode]"
        elif content_filter == "hexflate":
            data = zlib.compress(content, 6).hex().encode() + b">"
            filt = b"/Filter [/ASCIIHexDecode /FlateDecode]"
        elif content_filter == "rl":
            # simple literal-packet RunLength framing (valid, not tight)
            data = bytearray()
            for i in range(0, len(content), 128):
                chunk = content[i:i + 128]
                data += bytes([len(chunk) - 1]) + chunk
            data += b"\x80"
            data = bytes(data)
            filt = b"/Filter /RunLengthDecode"
        else:
            raise ValueError(f"unknown content_filter {content_filter}")
        return (b"<< /Length %d %s >>\nstream\n%s\nendstream"
                % (len(data), filt, data))

    # object layout: 1 catalog, 2 pages, 3 font (all compressed into the
    # ObjStm), then per page: content stream (direct), page dict
    # (compressed); finally the ObjStm and the XRef stream (direct).
    compressed: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    direct: dict[int, bytes] = {}
    next_id = 4
    kid_ids = []
    for pi, plines in enumerate(page_lines):
        chunks = []
        for li, line in enumerate(plines):
            y = TEXT_TOP - LEADING * li
            chunks.append(b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
                          % (FONT_SIZE, TEXT_X, y, escape_pdf_string(line)))
        rot = (shuffle_key + pi) % max(1, len(chunks))
        chunks = chunks[rot:] + chunks[:rot]
        ct_id = next_id
        direct[ct_id] = content_obj(b"\n".join(chunks))
        pg_id = next_id + 1
        compressed[pg_id] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % (PAGE_W, PAGE_H, ct_id))
        kid_ids.append(pg_id)
        next_id += 2
    compressed[2] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
                     % (b" ".join(b"%d 0 R" % k for k in kid_ids),
                        len(kid_ids)))
    objstm_id = next_id
    xref_id = next_id + 1

    # build the ObjStm payload: "num off num off ..." header + bodies
    comp_items = sorted(compressed.items())
    bodies = []
    offs = []
    off = 0
    for _num, body in comp_items:
        offs.append(off)
        bodies.append(body)
        off += len(body) + 1
    header = b" ".join(b"%d %d" % (num, o)
                       for (num, _b), o in zip(comp_items, offs))
    payload = header + b"\n" + b"\n".join(bodies) + b"\n"
    first = len(header) + 1
    zdata = zlib.compress(payload, 6)
    direct[objstm_id] = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d"
        b" /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(comp_items), first, len(zdata), zdata))

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(direct):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + direct[num] + b"\nendobj\n"

    # XRef stream: W [1 4 2]; type 0 free, 1 direct@offset, 2 in-objstm
    stm_index = {num: i for i, (num, _b) in enumerate(comp_items)}
    xref_at = len(out)
    nrows = xref_id + 1
    rows = bytearray()
    for num in range(nrows):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(
                2, "big")
        elif num in offsets:
            rows += bytes([1]) + offsets[num].to_bytes(4, "big") + bytes(2)
        elif num == xref_id:
            rows += bytes([1]) + xref_at.to_bytes(4, "big") + bytes(2)
        else:
            rows += (bytes([2]) + objstm_id.to_bytes(4, "big")
                     + stm_index[num].to_bytes(2, "big"))
    # PNG Up predictor over 7-byte rows (what real writers emit)
    row_bytes = 7
    filtered = bytearray()
    prev = bytes(row_bytes)
    for r in range(nrows):
        cur = bytes(rows[r * row_bytes:(r + 1) * row_bytes])
        filtered.append(2)  # Up
        filtered += bytes((c - p) & 0xFF for c, p in zip(cur, prev))
        prev = cur
    xz = zlib.compress(bytes(filtered), 6)
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R"
            b" /Filter /FlateDecode"
            b" /DecodeParms << /Predictor 12 /Columns 7 >> /Length %d"
            b" >>\nstream\n" % (xref_id, nrows, len(xz)))
    out += xz
    out += b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def encrypt_pdf(pdf: bytes, *, r: int = 3, nbits: int = 128,
                permissions: int = -44, aes: bool = False,
                aes256: bool = False, user_pw: bytes = b"",
                owner_pw: bytes = b"",
                encrypt_strings: bool = True) -> bytes:
    """Re-emit an engine-written classic-layout PDF as an ENCRYPTED file
    (ISO 32000 §7.6.3 standard security handler; empty user AND owner
    password by default — the ubiquitous "owner-locked" wild PDF — or
    real passwords via ``user_pw``/``owner_pw``). Object-level strings
    (/Info values, outline /Title, /URI actions) are encrypted with the
    per-object key alongside the streams, as §7.6.2 requires of a
    conforming writer (ADVICE r3). ``aes=False``:
    RC4 V1/V2 R2/R3 (RC4 preserves length, /Length stays valid);
    ``aes=True``: V4 R4 with the /StdCF /AESV2 crypt filter — streams
    become IV + CBC ciphertext, so /Length is patched per object. The
    trailer gains /Encrypt and /ID. Input must be classic-layout (no
    ObjStm)."""
    import hashlib

    from documentai_ray.functions.pdfcrypt import (Decryptor, compute_key,
                                                   compute_o, compute_u,
                                                   escape_crypt_string,
                                                   map_dict_strings)
    from documentai_ray.functions.pdfread import parse_objects

    if b"/Encrypt" in pdf:
        raise ValueError("already encrypted")
    if b"/ObjStm" in pdf:
        raise ValueError("encrypt_pdf supports classic layout only")
    if not encrypt_strings and not (aes or aes256):
        # /StrF routing only exists for V4/V5 crypt-filter files
        raise ValueError("encrypt_strings=False requires aes or aes256")
    strf = b"/StdCF" if encrypt_strings else b"/Identity"
    objects = parse_objects(pdf)
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", pdf)
    if not rm:
        raise ValueError("no /Root")
    root_num = int(rm.group(1))
    im = re.search(rb"/Info\s+(\d+)\s+0\s+R", pdf)
    info_ref = b" /Info %d 0 R" % int(im.group(1)) if im else b""
    file_id = hashlib.md5(pdf).digest()
    enc_num = max(objects) + 1
    if aes256:
        # V5 R6 (/AESV3, ISO 32000-2): SHA-2 password machinery, the
        # 32-byte FILE key encrypts every stream directly
        import struct as _st

        from documentai_ray.functions.aes import ecb_encrypt
        from documentai_ray.functions.pdfcrypt import (r6_owner_entries,
                                                       r6_user_entries)

        # fixed envelope (key + salts): Algorithm 2.B is deliberately
        # slow, and with the hash memoized a constant envelope makes the
        # whole password machinery a once-per-worker cost — stream
        # ciphertexts still differ per document via per-stream IVs.
        # (A production writer would draw a fresh key per file.)
        key = hashlib.sha256(b"graft-aes256-shared-envelope").digest()
        seed = hashlib.md5(b"graft-aes256-user-salts").digest()
        u, ue = r6_user_entries(key, vsalt=seed[:8], ksalt=seed[8:16],
                                password=user_pw)
        seed2 = hashlib.md5(b"graft-aes256-owner-salts").digest()
        o, oe = r6_owner_entries(key, u, vsalt=seed2[:8],
                                 ksalt=seed2[8:16],
                                 password=owner_pw or user_pw)
        perms = ecb_encrypt(key, _st.pack("<i", permissions)
                            + b"\xff\xff\xff\xffTadbnoon")
        enc_dct = (b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d"
                   b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                   b" /StmF /StdCF /StrF %s"
                   b" /U %s /UE %s /O %s /OE %s /Perms %s >>"
                   % (permissions, strf, escape_crypt_string(u),
                      escape_crypt_string(ue), escape_crypt_string(o),
                      escape_crypt_string(oe),
                      escape_crypt_string(perms)))
        cipher = Decryptor(enc_dct, file_id, password=user_pw)
        assert cipher.key == key  # /UE round-trip sanity
        out = bytearray(b"%PDF-1.7\n")
        offsets: dict[int, int] = {}
        for num in sorted(objects):
            dct, stream = objects[num]
            offsets[num] = len(out)
            if encrypt_strings:
                dct = map_dict_strings(
                    dct, lambda raw, n=num: cipher.encrypt(raw, n))
            if stream is not None:
                enc = cipher.encrypt(stream, num)
                if len(enc) != len(stream):
                    dct = re.sub(rb"/Length\s+\d+",
                                 b"/Length %d" % len(enc), dct, count=1)
                out += b"%d 0 obj\n" % num + dct
                out += b"\nstream\n" + enc + b"\nendstream"
            else:
                out += b"%d 0 obj\n" % num + dct
            out += b"\nendobj\n"
        offsets[enc_num] = len(out)
        out += b"%d 0 obj\n" % enc_num + enc_dct + b"\nendobj\n"
        nobjs = enc_num
        xref_at = len(out)
        out += b"xref\n0 %d\n" % (nobjs + 1)
        out += b"0000000000 65535 f \n"
        for num in range(1, nobjs + 1):
            out += b"%010d 00000 n \n" % offsets.get(num, 0)
        out += (b"trailer\n<< /Size %d /Root %d 0 R%s /Encrypt %d 0 R"
                b" /ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
                % (nobjs + 1, root_num, info_ref, enc_num,
                   file_id.hex().encode(), file_id.hex().encode(),
                   xref_at))
        return bytes(out)
    if aes:
        r, nbits = 4, 128
    key_bytes = 5 if r == 2 else nbits // 8
    o = compute_o(owner_pw, user_pw, r=min(r, 3), key_bytes=key_bytes)
    key = compute_key(user_pw, o, permissions, file_id, r=min(r, 3),
                      key_bytes=key_bytes)
    u = compute_u(key, file_id, r=min(r, 3))

    if aes:
        enc_dct = (b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d"
                   b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                   b" /StmF /StdCF /StrF %s /O %s /U %s >>"
                   % (permissions, strf, escape_crypt_string(o),
                      escape_crypt_string(u)))
    elif r == 2:
        enc_dct = (b"<< /Filter /Standard /V 1 /R 2 /P %d /O %s /U %s >>"
                   % (permissions, escape_crypt_string(o),
                      escape_crypt_string(u)))
    else:
        enc_dct = (b"<< /Filter /Standard /V 2 /R 3 /Length %d /P %d"
                   b" /O %s /U %s >>"
                   % (nbits, permissions, escape_crypt_string(o),
                      escape_crypt_string(u)))
    # a Decryptor on the final dict gives the exact cipher the reader
    # will use (RC4 object keys or AESV2 salted keys + IV framing)
    cipher = Decryptor(enc_dct, file_id, password=user_pw)

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        dct, stream = objects[num]
        offsets[num] = len(out)
        if encrypt_strings:
            dct = map_dict_strings(
                dct, lambda raw, n=num: cipher.encrypt(raw, n))
        if stream is not None:
            enc = cipher.encrypt(stream, num)
            if len(enc) != len(stream):  # AES grew the stream
                dct = re.sub(rb"/Length\s+\d+",
                             b"/Length %d" % len(enc), dct, count=1)
            out += b"%d 0 obj\n" % num + dct
            out += b"\nstream\n" + enc + b"\nendstream"
        else:
            out += b"%d 0 obj\n" % num + dct
        out += b"\nendobj\n"
    offsets[enc_num] = len(out)
    out += b"%d 0 obj\n" % enc_num + enc_dct + b"\nendobj\n"
    nobjs = enc_num
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (nobjs + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, nobjs + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root %d 0 R%s /Encrypt %d 0 R"
            b" /ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
            % (nobjs + 1, root_num, info_ref, enc_num,
               file_id.hex().encode(), file_id.hex().encode(), xref_at))
    return bytes(out)


def mixed_pdf(pages: list[tuple]) -> bytes:
    """Mixed text/image PDF 1.4 — the M16 output format: each entry is
    ``("text", [lines])`` (original page, text objects) or
    ``("image", uint8 (h, w) array)`` (reprocessed page, /DeviceGray
    Image XObject). This is the reference's ``preprocess_pdf_selective``
    artifact — a PDF interleaving untouched original pages with
    re-rasterized preprocessed pages
    (/root/reference/microservices/preprocessing-service/app.py:333-474).
    Deterministic bytes; text pages re-extract via ``pdfread`` and image
    pages decode via ``pdfread.page_images`` (the round-trip oracle)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    add(b"")  # 1: catalog
    add(b"")  # 2: pages
    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    kid_ids: list[int] = []
    for kind, payload in pages:
        if kind == "text":
            chunks = [b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
                      % (FONT_SIZE, TEXT_X, TEXT_TOP - LEADING * li,
                         escape_pdf_string(line))
                      for li, line in enumerate(payload)]
            content = b"\n".join(chunks)
            ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                        % (len(content), content))
            pg_id = add(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
                b" /Resources << /Font << /F1 %d 0 R >> >>"
                b" /Contents %d 0 R >>" % (PAGE_W, PAGE_H, font_id, ct_id))
        elif kind == "image":
            img = payload
            h, w = img.shape
            raw = img.tobytes()
            im_id = add(
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
                b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length %d >>\n"
                b"stream\n%s\nendstream" % (w, h, len(raw), raw))
            content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
            ct_id = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                        % (len(content), content))
            pg_id = add(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
                b" /Resources << /XObject << /Im0 %d 0 R >> >>"
                b" /Contents %d 0 R >>" % (w, h, im_id, ct_id))
        else:
            raise ValueError(f"unknown page kind {kind!r}")
        kid_ids.append(pg_id)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (b" ".join(b"%d 0 R" % k for k in kid_ids), len(kid_ids)))

    out = bytearray(b"%PDF-1.4\n")
    offsets: list[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def wrap_text_lines(text: str, *, words_per_line: int = 8) -> list[str]:
    """The deterministic text→lines layout shared by the PDF fixture and
    its oracle: whitespace-split words, 8 per line (same wrap as
    `minipdf.build_from_text`, so the SQL mirror is the same relayout)."""
    words = text.split()
    return [" ".join(words[i:i + words_per_line])
            for i in range(0, len(words), words_per_line)]


def validate(pdf: bytes) -> list[np.ndarray]:
    """Structural check + image round-trip. Raises on any malformation;
    returns the decoded page images (in page order)."""
    if not pdf.startswith(b"%PDF-1.4\n"):
        raise ValueError("bad header")
    m = re.search(rb"startxref\n(\d+)\n%%EOF\n$", pdf)
    if not m:
        raise ValueError("bad trailer")
    xref_at = int(m.group(1))
    if not pdf[xref_at:].startswith(b"xref\n"):
        raise ValueError("startxref does not point at xref")
    lines = pdf[xref_at:].split(b"\n")
    count = int(lines[1].split()[1])
    images: list[np.ndarray] = []
    # lines: [0]="xref", [1]="0 N", [2]=free entry, [2+i]=object i's entry
    for i in range(1, count):
        off = int(lines[2 + i].split()[0])
        head = b"%d 0 obj\n" % i
        if pdf[off:off + len(head)] != head:
            raise ValueError(f"object {i} not at recorded offset")
        body = pdf[off + len(head):]
        im = re.match(
            rb"<< /Type /XObject /Subtype /Image /Width (\d+) /Height (\d+)"
            rb" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length (\d+) >>\n"
            rb"stream\n", body)
        if im:
            w, h, ln = (int(im.group(k)) for k in (1, 2, 3))
            if ln != w * h:
                raise ValueError("image length mismatch")
            raw = body[im.end():im.end() + ln]
            images.append(np.frombuffer(raw, np.uint8).reshape(h, w))
    return images
