"""PDF 1.5-style constructs (ISO 32000): object streams, cross-reference
streams, and the common stream-filter chains (LZWDecode, ASCII85Decode,
ASCIIHexDecode, RunLengthDecode, FlateDecode + PNG predictors). The
writer emits files with NO classic xref/trailer at all, so extraction
only works if the ObjStm expansion really supplies the catalog/page
tree."""

from __future__ import annotations

import os
import zlib

import numpy as np
import pytest

from documentai_ray.functions.pdfread import (_ascii85_decode,
                                              _ascii_hex_decode,
                                              _run_length_decode,
                                              decode_stream, extract_text,
                                              parse_objects)
from documentai_ray.functions.pdfwrite import (ascii85_encode, text_to_pdf,
                                               text_to_pdf_modern)

LINES = [f"line {i} with some words here" for i in range(95)]


def test_ascii85_roundtrip():
    rng = np.random.RandomState(5)
    for data in [b"", b"a", b"ab", b"abc", b"abcd", b"hello world" * 7,
                 b"\x00" * 8, rng.bytes(1000)]:
        assert _ascii85_decode(ascii85_encode(data)) == data


def test_ascii_hex_and_runlength():
    assert _ascii_hex_decode(b"48 65 6c 6c 6f>") == b"Hello"
    assert _ascii_hex_decode(b"486>") == b"H`"  # odd digit pads with 0
    # literal + repeat + EOD
    assert _run_length_decode(b"\x02abc\xfeZ\x80junk") == b"abcZZZ"


@pytest.mark.parametrize("filt", ["lzw", "a85flate", "hexflate", "rl"])
def test_modern_pdf_extracts_identically(filt):
    base = extract_text(text_to_pdf(LINES, shuffle_key=3))
    pdf = text_to_pdf_modern(LINES, shuffle_key=3, content_filter=filt)
    assert b"/ObjStm" in pdf and b"/Type /XRef" in pdf
    assert b"trailer" not in pdf  # the ObjStm walk must carry the load
    assert extract_text(pdf) == base


def test_objstm_supplies_page_tree():
    pdf = text_to_pdf_modern(LINES)
    objs = parse_objects(pdf)
    # catalog (1), pages (2), font (3) and page dicts only exist inside
    # the ObjStm; expansion must have merged them
    assert b"/Type /Catalog" in objs[1][0]
    assert b"/Type /Pages" in objs[2][0]


def test_xref_stream_png_predictor_decodes():
    # decode the /Type /XRef stream through the filter machinery: PNG Up
    # predictor (12) over 7-byte rows must reconstruct type-1 offsets
    # that point at real "N 0 obj" headers
    pdf = text_to_pdf_modern(LINES[:10])
    objs = parse_objects(pdf)
    xnum = next(n for n, (d, s) in objs.items()
                if b"/Type /XRef" in d and s is not None)
    dct, stream = objs[xnum]
    rows = decode_stream(dct, stream)
    assert len(rows) % 7 == 0
    seen_direct = 0
    for r in range(len(rows) // 7):
        typ = rows[r * 7]
        off = int.from_bytes(rows[r * 7 + 1:r * 7 + 5], "big")
        if typ == 1 and r > 0:
            assert pdf[off:off + len(b"%d 0 obj" % r)] == b"%d 0 obj" % r
            seen_direct += 1
    assert seen_direct >= 3  # content streams + objstm + xref itself


def test_flate_png_predictor_on_content():
    # hand-build a predictor-12 FlateDecode stream and decode it
    raw = bytes(range(10)) * 7  # 70 bytes = 10 rows x 7 cols
    cols = 7
    filtered = bytearray()
    prev = bytes(cols)
    for r in range(10):
        cur = raw[r * cols:(r + 1) * cols]
        filtered.append(2)
        filtered += bytes((c - p) & 0xFF for c, p in zip(cur, prev))
        prev = cur
    dct = (b"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 "
           b"/Columns 7 >> >>")
    assert decode_stream(dct, zlib.compress(bytes(filtered))) == raw


def test_filter_chain_order_is_decoding_order():
    # /Filter [/ASCII85Decode /FlateDecode] means: a85 first, then flate
    payload = b"some content stream data"
    enc = ascii85_encode(zlib.compress(payload))
    dct = b"<< /Filter [/ASCII85Decode /FlateDecode] >>"
    assert decode_stream(dct, enc) == payload


def test_unsupported_filter_raises():
    with pytest.raises(ValueError, match="unsupported PDF filter"):
        decode_stream(b"<< /Filter /DCTDecode >>", b"\xff\xd8")


@pytest.mark.parametrize("filt", ["lzw", "a85flate"])
def test_modern_pdf_mutation_robustness(filt):
    rng = np.random.RandomState(3)
    base = text_to_pdf_modern(LINES[:30], content_filter=filt)
    for t in range(200):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(8, len(m))]
        try:
            extract_text(bytes(m))
        except ValueError:
            pass


def test_incremental_update_last_revision_wins():
    # appended-revision PDFs (how editors save): the sequential object
    # scan's later-definition-wins matches ISO 32000 incremental-update
    # semantics — the newest revision of an object is current
    import re

    base = text_to_pdf(["original first line", "second line"])
    new_content = (b"BT /F1 12 Tf 72 720 Td (revised first line) Tj ET\n"
                   b"BT /F1 12 Tf 72 706 Td (second line) Tj ET")
    m = re.search(rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream", base)
    ct_num = int(m.group(1))
    upd = bytearray(base)
    off = len(upd)
    upd += (b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (ct_num, len(new_content), new_content))
    xref_at = len(upd)
    upd += (b"xref\n%d 1\n%010d 00000 n \ntrailer\n"
            b"<< /Size 7 /Root 1 0 R /Prev 0 >>\nstartxref\n%d\n%%%%EOF\n"
            % (ct_num, off, xref_at))
    assert extract_text(base)[0].startswith("original first line")
    updated = extract_text(bytes(upd))[0]
    assert updated.startswith("revised first line")
    assert "second line" in updated


def test_document_info_roundtrip():
    from documentai_ray.functions.pdfread import document_info

    pdf = text_to_pdf(["hello"], info={"Title": "Doc (42)",
                                       "Author": "crawler\\test",
                                       "Producer": "graft"})
    assert document_info(pdf) == {"Title": "Doc (42)",
                                  "Author": "crawler\\test",
                                  "Producer": "graft"}
    assert extract_text(pdf)[0] == "hello"
    assert document_info(text_to_pdf(["x"])) == {}


def test_document_info_utf16_hex_title():
    from documentai_ray.functions.pdfread import document_info

    pdf = text_to_pdf(["x"], info={"Title": "placeholder"})
    raw = "Résumé ✓".encode("utf-16-be")
    hexstr = b"<FEFF" + raw.hex().encode() + b">"
    pdf2 = pdf.replace(b"/Title (placeholder)", b"/Title " + hexstr)
    assert document_info(pdf2)["Title"] == "Résumé ✓"


def test_document_outline_roundtrip():
    from documentai_ray.functions.pdfread import document_outline

    pdf = text_to_pdf([f"line {i}" for i in range(90)],
                      outline=["Intro", "Chapter (1)", "Appendix A"])
    assert document_outline(pdf) == ["Intro", "Chapter (1)", "Appendix A"]
    assert extract_text(pdf)[0].startswith("line 0")
    assert document_outline(text_to_pdf(["x"])) == []


def test_document_outline_cycle_guard():
    from documentai_ray.functions.pdfread import document_outline

    pdf = text_to_pdf(["x"], outline=["A", "B"])
    # splice a cycle: B's /Next points back at A — walk must terminate
    import re

    m = list(re.finditer(rb"/Title \((\w)\)", pdf))
    assert len(m) == 2
    first_item = pdf[:m[0].start()].rfind(b" 0 obj")
    first_num = int(pdf[:first_item].rsplit(b"\n", 1)[-1])
    looped = pdf.replace(b"/Title (B) /Parent",
                         b"/Title (B) /Next %d 0 R /Parent" % first_num)
    toc = document_outline(looped)
    assert toc[:2] == ["A", "B"] and len(toc) <= 3


def test_document_links_roundtrip():
    from documentai_ray.functions.pdfread import document_links

    urls = ["https://a.example/x?q=1", "https://b.example/path(v)",
            "mailto:x@y.example"]
    pdf = text_to_pdf([f"line {i}" for i in range(10)], links=urls)
    assert document_links(pdf) == urls
    assert extract_text(pdf)[0].startswith("line 0")
    assert document_links(text_to_pdf(["x"])) == []
