"""BITFONT — a deterministic 5×7 bitmap font for the real OCR path.

Tesseract is absent, so the engine closes the OCR loop itself: the
rasterizer draws text with this font (one 5×7 glyph per printable ASCII
char, 6 px advance) and ``stages/ocr.py`` reads it back by exact
template matching. The glyph shapes are NOT human-readable letterforms —
each is a unique pixel pattern derived from md5 of the character — which
is irrelevant to the pipeline contract: what matters is that rendering
and recognition are two independent real computations whose composition
must reproduce the source text byte-identically (the oracle).

Glyph construction: 35 bits of md5(char), with the WHOLE left column and
the right corners forced ON — so every glyph has ink in all 7 rows (band
segmentation can rely on 7-row islands even for a single-glyph line) and
in its first and last column (the 6-px scan walk can anchor on column
ink). Uniqueness across the 94 printable glyphs is asserted at import.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
CELL_W = 6  # 5 ink columns + 1 blank spacing column
CHARS = [chr(c) for c in range(33, 127)]  # printable ASCII minus space


def _glyph(ch: str) -> np.ndarray:
    bits = int.from_bytes(hashlib.md5(ch.encode()).digest()[:5], "big")
    g = np.zeros((GLYPH_H, GLYPH_W), bool)
    for i in range(GLYPH_H * GLYPH_W):
        g[i // GLYPH_W, i % GLYPH_W] = (bits >> i) & 1
    g[:, 0] = True  # full left edge: every row and the first column inked
    g[0, -1] = g[-1, -1] = True
    return g


GLYPHS: dict[str, np.ndarray] = {c: _glyph(c) for c in CHARS}
_LOOKUP: dict[bytes, str] = {g.tobytes(): c for c, g in GLYPHS.items()}
assert len(_LOOKUP) == len(CHARS), "bitfont glyph collision"


def draw_text(img: np.ndarray, x: int, y: int, text: str,
              ink: int = 0) -> None:
    """Draw ``text`` with its first glyph's top-left at (x, y); spaces
    advance the pen without ink. Clips at the canvas edge."""
    h, w = img.shape
    for i, ch in enumerate(text):
        if ch == " ":
            continue
        g = GLYPHS.get(ch)
        if g is None:
            continue
        gx = x + i * CELL_W
        if gx + GLYPH_W > w or y + GLYPH_H > h or gx < 0 or y < 0:
            continue
        img[y:y + GLYPH_H, gx:gx + GLYPH_W][g] = ink


_GLYPH_MATRIX = np.stack([GLYPHS[c] for c in CHARS]).reshape(len(CHARS), -1)


def match_glyph(cell: np.ndarray, *, max_hamming: int = 3) -> str | None:
    """5×7 template lookup: exact byte match first (the lossless path),
    then a nearest-template fallback for scans that survived a LOSSY
    channel (JPEG ringing, rescale dust) — accepted only when the best
    Hamming distance is ≤ ``max_hamming`` AND uniquely best (ties are
    ambiguity, not evidence). None if the pattern is unknown."""
    if cell.shape != (GLYPH_H, GLYPH_W):
        return None
    hit = _LOOKUP.get(np.ascontiguousarray(cell).tobytes())
    if hit is not None or max_hamming <= 0:
        return hit
    d = (_GLYPH_MATRIX != cell.reshape(-1)[None, :]).sum(axis=1)
    best = int(d.argmin())
    bd = int(d[best])
    if bd > max_hamming or int((d == bd).sum()) > 1:
        return None
    return CHARS[best]
