"""HTTP wire-encoding transparency in the WARC reader: real Common
Crawl response records carry bodies as captured — chunked
transfer-encoding and/or gzip/deflate content-encoding — and the
envelope decoder must reverse both layers (warcio recompression
semantics) while degrading, not dropping, malformed layers."""

from __future__ import annotations

import datetime as dt
import gzip
import zlib

from documentai_ray.functions.warc import (_chunk_body, _dechunk,
                                           _decode_http_body, build_record,
                                           iter_warc)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)
BODY = ("<html><body><main>" + "hello world " * 500
        + "</main></body></html>").encode()


def test_all_wire_encodings_decode_identically():
    encs = ("identity", "chunked", "gzip", "gzip+chunked")
    blob = b"".join(build_record(f"https://x.example/{e}", TS, BODY,
                                 http_encoding=e) for e in encs)
    out = list(iter_warc(blob))
    assert [u.rsplit("/", 1)[1] for u, _t, _b in out] == list(encs)
    assert all(b == BODY for _u, _t, b in out)


def test_chunk_framing_roundtrip():
    for n in (0, 1, 996, 997, 998, 5000):
        data = bytes(range(256)) * (n // 256 + 1)
        data = data[:n]
        assert _dechunk(_chunk_body(data)) == data


def test_chunk_extensions_are_ignored():
    # RFC 9112 allows chunk extensions after the size: "5;ext=1\r\n"
    framed = b"5;ext=v\r\nhello\r\n0\r\n\r\n"
    assert _dechunk(framed) == b"hello"


def test_malformed_layers_degrade_to_captured_bytes():
    assert _dechunk(b"not chunked at all") == b"not chunked at all"
    assert _dechunk(b"zz\r\nbody") == b"zz\r\nbody"
    # gzip header that isn't gzip: body kept as captured
    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
    assert _decode_http_body(head, b"\x1f\x8bgarbage") == b"\x1f\x8bgarbage"


def test_deflate_both_flavors():
    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
    assert _decode_http_body(head, zlib.compress(BODY)) == BODY
    raw = zlib.compressobj(wbits=-15)
    rawd = raw.compress(BODY) + raw.flush()
    assert _decode_http_body(head, rawd) == BODY  # raw-deflate servers


def test_x_gzip_alias():
    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: x-gzip"
    assert _decode_http_body(head, gzip.compress(BODY)) == BODY


def test_header_case_insensitive():
    head = b"HTTP/1.1 200 OK\r\nTRANSFER-ENCODING: Chunked".lower()
    assert _decode_http_body(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: CHUNKED",
        _chunk_body(b"abc")) == b"abc"
    assert _decode_http_body(head, _chunk_body(b"abc")) == b"abc"


def test_http_charset_from_envelope():
    from documentai_ray.functions.warc import _http_charset, _iter_warc_full

    assert _http_charset(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1"
    ) == "iso-8859-1"
    assert _http_charset(
        b'HTTP/1.1 200 OK\r\ncontent-type: text/html;charset="utf-8"'
    ) == "utf-8"
    assert _http_charset(b"HTTP/1.1 200 OK\r\nContent-Type: text/html") == ""
    rec = build_record("https://x.example/a", TS, b"<html>x</html>",
                       content_type="text/html; charset=windows-1252")
    (_u, _t, _b, cs), = list(_iter_warc_full(rec))
    assert cs == "windows-1252"


def test_declared_charset_beats_sniffing():
    from documentai_ray.stages.extract import extract_one, sniff_decode

    body = ("<html><head><title>Caf\xe9</title></head>"
            "<body>x</body></html>").encode("latin-1")
    # strict path: invalid UTF-8 → error row
    assert extract_one(body)[1] == "error"
    # declared charset resolves it
    assert extract_one(body, declared_charset="iso-8859-1")[1] == "html"
    # precedence: BOM still outranks a (wrong) declared label
    bom = "﻿plain".encode("utf-8")
    text, enc = sniff_decode(bom, declared="cp1251")
    assert enc == "utf-8-sig" and text == "plain"
    # bad labels fall through to sniffing rather than failing
    text, enc = sniff_decode(b"hello", declared="no-such-charset")
    assert enc == "utf-8" and text == "hello"
