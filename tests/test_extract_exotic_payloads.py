"""One dispatched extract_batch over every exotic payload the round-3
sessions enabled: classic, modern (ObjStm+filter-chain), encrypted
(RC4 + AESV2) and subset-font (/ToUnicode) PDFs all extract the SAME
text through the %PDF- magic dispatch — no stage-level special-casing
anywhere."""

from __future__ import annotations

import pyarrow as pa

from documentai_ray.functions.pdfwrite import (encrypt_pdf, text_to_pdf,
                                               text_to_pdf_cmap,
                                               text_to_pdf_modern)
from documentai_ray.stages.extract import extract_batch

LINES = [f"line {i} of the shared document body" for i in range(20)]
WANT = "\n".join(LINES)


def _batch(payloads):
    return pa.table({
        "url": pa.array([f"https://x.example/{i}"
                         for i in range(len(payloads))]),
        "html": pa.array(payloads, pa.large_binary()),
    })


def test_every_pdf_flavor_extracts_identically():
    plain = text_to_pdf(LINES, shuffle_key=2)
    payloads = [
        plain,
        text_to_pdf(LINES, shuffle_key=2, compress=True),
        text_to_pdf_modern(LINES, shuffle_key=2, content_filter="lzw"),
        text_to_pdf_modern(LINES, shuffle_key=2,
                           content_filter="a85flate"),
        encrypt_pdf(plain),                      # RC4 R3
        encrypt_pdf(plain, r=2, nbits=40),       # RC4 R2
        encrypt_pdf(plain, aes=True),            # AESV2
        text_to_pdf_cmap(LINES, shuffle_key=2),  # /ToUnicode
    ]
    out = extract_batch(_batch(payloads))
    texts = out.column("text").to_pylist()
    kinds = out.column("payload_kind").to_pylist()
    errors = out.column("error").to_pylist()
    assert kinds == ["pdf"] * len(payloads)
    assert errors == [""] * len(payloads)
    assert texts == [WANT] * len(payloads)


def test_damaged_exotic_payloads_degrade_to_error_rows():
    bad = [
        text_to_pdf_modern(LINES)[:300],             # truncated modern
        encrypt_pdf(text_to_pdf(LINES))[:400],       # truncated encrypted
        b"%PDF-1.5\ngarbage with no objects at all",
    ]
    out = extract_batch(_batch(bad))
    assert out.column("payload_kind").to_pylist() == ["error"] * 3
    assert all(e for e in out.column("error").to_pylist())
    assert out.column("text").to_pylist() == [""] * 3
