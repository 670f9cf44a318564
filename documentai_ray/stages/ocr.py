"""Real OCR stage (M3/M4) over bitfont-rendered page rasters.

Reference behavior: the OCR path runs tesseract ``image_to_string`` /
``image_to_data`` over rasterized pages
(/root/reference/microservices/entity-extraction-service/app.py OCR
branch). Tesseract is absent, so the engine pairs its own renderer
(functions/raster.py glyphs mode, 5×7 bitfont) with this matched-template
reader. Recognition is REAL image analysis — band segmentation by ink
rows, column-island glyph segmentation, exact template lookup, word
grouping by gap width — not a lookup of the source text; the pipeline
contract (render → PNG encode → PNG decode → OCR == source text,
byte-identical) is the oracle.

Geometry facts the scanner relies on (all from the layout spec):
glyph cells are 5 ink columns + 1 blank (6 px advance), so intra-word
gaps are exactly 1 blank column while inter-word gaps are ≥2 (the
layout's 6·len+4 advance leaves 5); text bands are 7 rows tall with
≥4 blank rows between them (12 px line step).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from documentai_ray.functions.bitfont import GLYPH_H, GLYPH_W, match_glyph


def _islands(mask: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) runs of True in a 1-D bool array."""
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.r_[idx[0], idx[breaks + 1]]
    ends = np.r_[idx[breaks], idx[-1]] + 1
    return list(zip(starts.tolist(), ends.tolist()))


def ocr_image(img: np.ndarray) -> tuple[str, list[dict]]:
    """(text, word_boxes) — lines joined with ``\\n``, words with spaces;
    boxes in the reference's word-box shape (page filled by the caller).
    Unknown glyph patterns decode to ``?`` (never crash on noise)."""
    ink = img < 128
    lines_out: list[str] = []
    boxes: list[dict] = []
    width = img.shape[1]
    for y0, y1 in _islands(ink.any(axis=1)):
        if y1 - y0 != GLYPH_H:
            continue  # not a text band (noise or partial clip)
        band = ink[y0:y1]
        cols = band.any(axis=0)
        words: list[str] = []
        cur = ""
        cur_x0 = None

        def flush(end_x: int) -> None:
            nonlocal cur, cur_x0
            if cur:
                boxes.append({"text": cur, "x0": int(cur_x0), "y0": int(y0),
                              "x1": int(end_x), "y1": int(y0 + GLYPH_H),
                              "conf": 1.0})
                words.append(cur)
            cur, cur_x0 = "", None

        # glyph walk anchored on the corner guarantee: every glyph has
        # ink in its FIRST column, so from a glyph at x the next glyph of
        # the same word shows ink exactly at x+6; a blank x+6 ends the
        # word and the next ink column starts the next word
        nz = np.flatnonzero(cols)
        x = int(nz[0]) if len(nz) else None
        while x is not None:
            cell = band[:, x:x + GLYPH_W]
            if cell.shape[1] < GLYPH_W:
                break
            ch = match_glyph(cell)
            if cur_x0 is None:
                cur_x0 = x
            cur += ch if ch is not None else "?"
            nxt = x + GLYPH_W + 1
            if nxt < width and cols[nxt]:
                x = nxt
            else:
                flush(x + GLYPH_W)
                later = nz[nz > x + GLYPH_W]
                x = int(later[0]) if len(later) else None
        lines_out.append(" ".join(words))
    return "\n".join(lines_out), boxes


class OcrStage:
    """Actor-pool M3/M4: PNG page image in → recognized text + word boxes
    out. Decode (minipng) and recognition are per-row real computations;
    batch size should stay small (wide binary rows)."""

    BOX_TYPE = pa.list_(pa.struct([
        ("text", pa.string()), ("page", pa.int64()),
        ("x0", pa.int64()), ("y0", pa.int64()),
        ("x1", pa.int64()), ("y1", pa.int64()), ("conf", pa.float64())]))

    def __init__(self, png_col: str = "png"):
        self.png_col = png_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from documentai_ray.functions import minipng

        texts: list[str] = []
        all_boxes: list[list[dict]] = []
        for payload in batch.column(self.png_col).to_pylist():
            if not payload:
                texts.append("")
                all_boxes.append([])
                continue
            text, boxes = ocr_image(minipng.decode_gray(payload))
            for b in boxes:
                b["page"] = 1
            texts.append(text)
            all_boxes.append(boxes)
        batch = batch.drop_columns([self.png_col])
        out = batch.append_column("ocr_text",
                                  pa.array(texts, pa.large_string()))
        return out.append_column("ocr_boxes",
                                 pa.array(all_boxes, self.BOX_TYPE))


def table_cells_from_boxes(boxes: list[dict], *,
                           col_gap: int = 24) -> list[list[str]]:
    """Pixel-domain table-structure recovery (the PPStructureV3 table-OCR
    analog, M19's other half — reference
    entity_extraction_updated/extractor/lc_application.py:40-41 runs
    table OCR over page IMAGES): word boxes → row/cell grid.

    Rows = OCR text bands (boxes sharing a ``y0``); within a row, a
    horizontal whitespace run ≥ ``col_gap`` px splits cells (intra-cell
    word gaps are ≤ ~11 px — one blank space glyph plus scan slack —
    while column gutters are ≥ 70 px in any sane table layout). Cell
    text joins words with single spaces. Returns rows top-to-bottom,
    cells left-to-right — the same ``list[list[str]]`` shape as the
    HTML-table walk (`entities.extract_html_tables`), so the downstream
    tag-dict logic is SHARED between the HTML and pixel paths."""
    by_row: dict[int, list[dict]] = {}
    for b in boxes:
        by_row.setdefault(int(b["y0"]), []).append(b)
    rows: list[list[str]] = []
    for y in sorted(by_row):
        ws = sorted(by_row[y], key=lambda b: b["x0"])
        groups: list[list[dict]] = [[ws[0]]]
        for b in ws[1:]:
            if b["x0"] - groups[-1][-1]["x1"] >= col_gap:
                groups.append([b])
            else:
                groups[-1].append(b)
        rows.append([" ".join(w["text"] for w in g) for g in groups])
    return rows


def layout_analysis(img: np.ndarray, *, block_gap: int = 40) -> dict:
    """Document-layout analysis over PIXELS (the PPStructure-analog T3
    path): text-line bands from ink-row islands, words from the glyph
    walk, and blocks by grouping consecutive bands whose vertical gap is
    below ``block_gap`` (the layout's intra-block line step is 12 px,
    inter-block step 100 px). Returns counts + block boxes — recovered
    from the raster alone, never from the source layout tree."""
    text, boxes = ocr_image(img)
    bands = sorted({(b["y0"], b["y1"]) for b in boxes})
    n_blocks = 0
    blocks: list[dict] = []
    prev_y1 = None
    for y0, y1 in bands:
        if prev_y1 is None or y0 - prev_y1 > block_gap:
            n_blocks += 1
            blocks.append({"y0": y0, "y1": y1, "n_lines": 1})
        else:
            blocks[-1]["y1"] = y1
            blocks[-1]["n_lines"] += 1
        prev_y1 = y1
    return {"n_blocks": n_blocks, "n_lines": len(bands),
            "n_words": len(boxes), "blocks": blocks}


class LayoutAnalysisStage:
    """Actor-pool T3 analog: PNG page image → structural counts."""

    def __init__(self, png_col: str = "png"):
        self.png_col = png_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from documentai_ray.functions import minipng

        nb, nl, nw = [], [], []
        for payload in batch.column(self.png_col).to_pylist():
            if not payload:
                nb.append(0)
                nl.append(0)
                nw.append(0)
                continue
            lay = layout_analysis(minipng.decode_gray(payload))
            nb.append(lay["n_blocks"])
            nl.append(lay["n_lines"])
            nw.append(lay["n_words"])
        batch = batch.drop_columns([self.png_col])
        out = batch.append_column("n_blocks", pa.array(nb, pa.int64()))
        out = out.append_column("n_lines", pa.array(nl, pa.int64()))
        return out.append_column("n_words", pa.array(nw, pa.int64()))
