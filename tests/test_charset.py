"""Charset-sniffing decode (WHATWG-style BOM → strict UTF-8 → meta
charset → cp1252 fallback) and the legacy-encoding corpus variant."""

from __future__ import annotations

import pytest

from documentai_ray.sources.pages import golden_text, payload_for
from documentai_ray.stages.extract import extract_one, sniff_decode


def test_bom_utf8():
    t, enc = sniff_decode("﻿héllo".encode("utf-8-sig") or b"")
    assert enc == "utf-8-sig"
    # utf-8-sig encode puts the BOM first; sniff strips it
    t2, _ = sniff_decode(b"\xef\xbb\xbfh\xc3\xa9llo")
    assert t2 == "héllo"


@pytest.mark.parametrize("codec", ["utf-16", "utf-16-le", "utf-16-be"])
def test_utf16_boms(codec):
    payload = "héllo wörld".encode("utf-16")  # platform-endian with BOM
    t, enc = sniff_decode(payload)
    assert (t, enc) == ("héllo wörld", "utf-16")


def test_strict_utf8_first():
    t, enc = sniff_decode("plain ascii".encode())
    assert (t, enc) == ("plain ascii", "utf-8")
    t, enc = sniff_decode("naïve café".encode("utf-8"))
    assert (t, enc) == ("naïve café", "utf-8")


def test_meta_charset_latin1():
    raw = '<html><head><meta charset="iso-8859-1"></head>caf\xe9</html>'
    t, enc = sniff_decode(raw.encode("latin-1"))
    assert enc in ("iso-8859-1", "iso8859-1")
    assert "café" in t


def test_http_equiv_cp1252():
    raw = ('<html><head><meta http-equiv="Content-Type" '
           'content="text/html; charset=windows-1252"></head>caf€</html>')
    t, enc = sniff_decode(raw.encode("cp1252"))
    assert enc == "windows-1252"
    assert "caf€" in t


def test_no_meta_falls_back_cp1252():
    t, enc = sniff_decode(b"smart \x93quotes\x94")
    assert enc == "cp1252"
    assert t == "smart “quotes”"


def test_bad_meta_name_falls_through():
    raw = b'<meta charset="no-such-codec">caf\xe9'
    t, enc = sniff_decode(raw)
    assert enc == "cp1252"
    assert "café" in t


@pytest.mark.parametrize("doc_id", list(range(0, 24)) + [97, 194, 14, 39])
def test_encoded_corpus_extracts_golden(doc_id):
    """Every encoding variant must extract to the SAME golden text the
    plain-UTF-8 corpus produces — including the malformed row (97·k)."""
    text = ("alpha beta gamma delta epsilon zeta eta theta " * 4).strip()
    plain = extract_one(payload_for(doc_id, text), charset_sniff=True)[0]
    enc_payload = payload_for(doc_id, text, encodings=True)
    got = extract_one(enc_payload, charset_sniff=True)[0]
    assert got == plain == golden_text(doc_id, text)


def test_legacy_variants_are_really_non_utf8():
    text = ("alpha beta gamma delta epsilon zeta eta theta " * 4).strip()
    # doc_id 2 → latin-1 variant, doc_id 3 → cp1252 variant (both ASCII
    # content + injected non-ASCII head marker that breaks strict UTF-8)
    for doc_id in (2, 3):
        p = payload_for(doc_id, text, encodings=True)
        with pytest.raises(UnicodeDecodeError):
            p.decode("utf-8")
    # doc_id 1 → utf-16 with BOM
    p = payload_for(1, text, encodings=True)
    assert p.startswith((b"\xff\xfe", b"\xfe\xff"))


def test_non_ascii_content_keeps_utf8_for_8bit_variants():
    text = ("naïve café résumé " * 10).strip()  # not ASCII → can't pin 8-bit bytes
    for doc_id in (10, 3):  # archetypes that embed the text
        p = payload_for(doc_id, text, encodings=True)
        if doc_id % 4 in (2, 3):
            p.decode("utf-8")  # must still be valid UTF-8


def test_strict_default_unchanged():
    """charset_sniff defaults OFF: legacy bytes stay hard error rows."""
    _, kind, err, _ = extract_one(b"caf\xe9 legacy")
    assert kind == "error" and "UnicodeDecodeError" in err


# ---------------------------------------------------------------------------
# outlink extraction (href parse + urljoin resolution)
# ---------------------------------------------------------------------------

def test_outlink_resolution_rules():
    from documentai_ray.stages.extract import extract_outlinks

    base = "https://a.example.com/dir/page.html"
    html = (
        '<a href="/abs/path">x</a>'
        '<a href="rel.html">x</a>'
        '<a href="../up.html">x</a>'
        '<a href="//other.example.com/p">x</a>'
        '<a href="http://plain.example.com/q">x</a>'
        '<a href="#frag">x</a>'
        '<a href="mailto:a@b.c">x</a>'
        '<a href="javascript:void(0)">x</a>'
        "<a href='single-quoted'>x</a>"
        "<a href=unquoted>x</a>"
        '<a class="c" href="/after-attr">x</a>'
    )
    got = extract_outlinks(base, html)
    assert got == [
        "https://a.example.com/abs/path",
        "https://a.example.com/dir/rel.html",
        "https://a.example.com/up.html",
        "https://other.example.com/p",
        "http://plain.example.com/q",
        "https://a.example.com/dir/single-quoted",
        "https://a.example.com/dir/unquoted",
        "https://a.example.com/after-attr",
    ]


def test_outlinks_batch_skips_undecodable_and_nonhtml():
    import pyarrow as pa

    from documentai_ray.functions import minipdf
    from documentai_ray.stages.extract import outlinks_batch

    pdf_payload, _ = minipdf.build_from_text("hello world", shuffle_key=1)
    batch = pa.table({
        "url": pa.array(["https://h/p/1", "https://h/p/2", "https://h/p/3"]),
        "html": pa.array(
            [b'<a href="/x">x</a>', b"\xff\xfe\x00bad", pdf_payload],
            pa.large_binary()),
    })
    out = outlinks_batch(batch)
    assert out.column("url").to_pylist() == ["https://h/p/1"]
    assert out.column("link").to_pylist() == ["https://h/x"]
    assert out.column("dst_host").to_pylist() == ["h"]


# ---------------------------------------------------------------------------
# robots meta directives
# ---------------------------------------------------------------------------

def test_robots_directives_parsing():
    from documentai_ray.stages.extract import robots_directives

    assert robots_directives(
        b'<head><meta name="robots" content="noindex, nofollow"></head>'
    ) == {"noindex", "nofollow"}
    # attribute order reversed + single quotes + case folding
    assert robots_directives(
        b"<meta content='NOINDEX' name='ROBOTS'>") == {"noindex"}
    # other metas ignored; no robots meta -> empty
    assert robots_directives(b'<meta charset="utf-8">') == set()
    assert robots_directives(b"\xff\xfe\x00garbage") == set()


def test_robots_filter_batch():
    import pyarrow as pa

    from documentai_ray.stages.extract import robots_filter_batch

    batch = pa.table({
        "url": pa.array(["u1", "u2", "u3", "u4"]),
        "html": pa.array([
            b"<html><head></head>ok</html>",
            b'<html><head><meta name="robots" content="noindex"></head></html>',
            b'<html><head><meta name="robots" content="none"></head></html>',
            b'<html><head><meta name="robots" content="nofollow"></head></html>',
        ], pa.large_binary()),
    })
    out = robots_filter_batch(batch)
    # noindex and none drop; plain and nofollow-only pages stay
    assert out.column("url").to_pylist() == ["u1", "u4"]


def test_page_meta_title():
    import pyarrow as pa

    from documentai_ray.stages.extract import page_meta_batch

    batch = pa.table({
        "url": pa.array(["u1", "u2", "u3"]),
        "html": pa.array([
            b"<html><head><title>  A \n Title </title></head></html>",
            b"<html><head></head>no title</html>",
            b"\xff\xfe\x00bad",
        ], pa.large_binary()),
    })
    out = page_meta_batch(batch)
    assert out.column("url").to_pylist() == ["u1", "u2"]
    assert out.column("title").to_pylist() == ["A Title", ""]
