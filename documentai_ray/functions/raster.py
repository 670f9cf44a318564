"""MINIPDF page rasterizer — the REAL S3 (pdf2image) analog.

The reference's pdf2image step renders the first PDF page to pixels for
the OCR/quality path. Poppler isn't in this container, but MINIPDF's
layout tree is exact geometry — rendering it is a deterministic numpy
fill: every span bbox becomes an ink rectangle on a letter-size canvas.
The output is a genuine grayscale page image that feeds the real image
pipeline (minipng encode → imaging metrics), and because span boxes are
disjoint by construction (build_from_lines geometry: 6·len × 10 boxes
with 4 px x-gaps / 2 px y-gaps), the ink-pixel count has the closed form
``60 · Σ len(word)`` over the page's words — the rasterizer's oracle.
"""

from __future__ import annotations

import numpy as np

PAGE_W = 612  # letter @ 72 dpi, the pdf2image default
PAGE_H = 792


def rasterize_page(page: dict, *, width: int = PAGE_W,
                   height: int = PAGE_H, glyphs: bool = False) -> np.ndarray:
    """Render one MINIPDF page dict (unscaled coords) to uint8 grayscale:
    255 background, 0 ink; boxes clipped to the canvas.

    ``glyphs=False``: each span bbox is a filled rectangle (ink-count
    oracle). ``glyphs=True``: each span's TEXT is drawn with the 5×7
    bitfont at the span origin (6 px/char — exactly the layout's 6·len
    span width), which is what the real OCR stage reads back."""
    img = np.full((height, width), 255, np.uint8)
    if glyphs:
        from documentai_ray.functions.bitfont import draw_text

    for block in page["blocks"]:
        for line in block["lines"]:
            for span in line["spans"]:
                x0, y0, x1, y1 = span["bbox"]
                if glyphs:
                    draw_text(img, int(x0), int(y0) + 1, span["text"])
                    continue
                xa, ya = max(0, int(x0)), max(0, int(y0))
                xb, yb = min(width, int(x1)), min(height, int(y1))
                if xb > xa and yb > ya:
                    img[ya:yb, xa:xb] = 0
    return img


def rasterize_first_page(payload: bytes, *, width: int = PAGE_W,
                         height: int = PAGE_H,
                         glyphs: bool = False) -> np.ndarray | None:
    """First-page raster (the reference's ``pdf2image(..., last_page=1)``
    truncation); ``None`` for unrecognized payloads (error rows).

    Handles BOTH binary page formats: MINIPDF layout trees (span bboxes)
    and real ``%PDF-`` payloads (page-1 text runs from the content-stream
    parse, drawn with the bitfont at their PDF positions with the y axis
    flipped — so the real-PDF path composes with the OCR stage exactly
    like the MINIPDF glyphs path; pytest pins render → OCR == extracted
    page text)."""
    from documentai_ray.functions import minipdf, pdfread

    if pdfread.is_pdf(payload):
        try:
            streams = pdfread.page_content_streams(payload)
        except ValueError:
            return None
        img = np.full((height, width), 255, np.uint8)
        if streams:
            from documentai_ray.functions.bitfont import GLYPH_H, draw_text

            for x, y, _size, text in pdfread.text_runs(streams[0]):
                draw_text(img, int(x), int(height - y - GLYPH_H), text)
        return img
    if not minipdf.is_minipdf(payload):
        return None
    pages = minipdf.decode(payload)
    if not pages:
        return None
    return rasterize_page(pages[0], width=width, height=height,
                          glyphs=glyphs)
