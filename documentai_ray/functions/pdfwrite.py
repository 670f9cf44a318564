"""Real ISO-32000 PDF writer for the images→PDF sink (K2).

The reference's images→PDF endpoint re-bundles page images into one PDF
(`img2pdf` behind its FastAPI surface). `img2pdf`/PIL aren't in this
container, but a minimal PDF is just a byte layout — this writer emits a
GENUINE PDF 1.4 file any conforming viewer opens: one page per grayscale
image, each page an uncompressed 8-bit /DeviceGray Image XObject drawn
1:1 via a `cm` matrix, with a correct xref table (byte-exact offsets)
and trailer. Deterministic output: same images → same bytes.

`validate()` re-parses the xref and checks every object really starts at
its recorded offset, and round-trips the raw image bytes back out — the
writer's own proof of well-formedness (pytest golden)."""

from __future__ import annotations

import re

import numpy as np


def images_to_pdf(images: list[np.ndarray]) -> bytes:
    """Grayscale uint8 (h, w) arrays → one PDF page per image."""
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
