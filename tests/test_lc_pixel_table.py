"""Pixel-table → LC tag recovery (M19 completion, VERDICT r2 #3).

The reference's LC route is PPStructureV3 table OCR over page IMAGES
(/root/reference/entity_extraction_updated/extractor/lc_application.py:40-41);
the rebuild composes its own rasterizer → internal OCR → band/column cell
grid → the SAME tag-dict logic the HTML path uses."""

from documentai_ray.functions import minipng
from documentai_ray.sources.pages import _html_lc, lc_pixel_page_png, lc_tag_values
from documentai_ray.stages.entities import extract_lc_tags, lc_tags_from_rows
from documentai_ray.stages.ocr import ocr_image, table_cells_from_boxes


def test_pixel_path_equals_html_path_and_golden():
    for doc_id in (9, 19, 29, 39, 49, 1009, 54329):
        png = lc_pixel_page_png(doc_id)
        _text, boxes = ocr_image(minipng.decode_gray(png))
        got = lc_tags_from_rows(table_cells_from_boxes(boxes))
        assert got == lc_tag_values(doc_id)
        assert got == extract_lc_tags(_html_lc(doc_id))


def test_cell_grid_shapes():
    """34 rows; even rows 3 cells (code|desc|value), odd rows 2 cells."""
    png = lc_pixel_page_png(19)
    _text, boxes = ocr_image(minipng.decode_gray(png))
    rows = table_cells_from_boxes(boxes)
    assert len(rows) == 34
    for i, row in enumerate(rows):
        assert len(row) == (2 if i % 2 else 3), (i, row)
        if i % 2 == 0:
            assert row[1] == f"FIELD {i}"


def test_column_split_threshold():
    """Intra-cell single-space word gaps never split; gutters do."""
    boxes = [
        {"text": "USD", "x0": 300, "x1": 318, "y0": 30, "y1": 37},
        {"text": "1000.00", "x0": 324, "x1": 366, "y0": 30, "y1": 37},
        {"text": "F32B", "x0": 36, "x1": 60, "y0": 30, "y1": 37},
    ]
    rows = table_cells_from_boxes(boxes)
    assert rows == [["F32B", "USD 1000.00"]]
