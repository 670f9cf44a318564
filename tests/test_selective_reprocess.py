"""M16 selective page reprocessing — mixed original/processed PDF
(reference preprocessing-service/app.py:333-474)."""

import numpy as np

from documentai_ray.functions import minipdf, pdfread
from documentai_ray.functions.minipdf import build_from_text
from documentai_ray.functions.pdfwrite import mixed_pdf
from documentai_ray.stages.preprocess import selective_reprocess

KEYS = ["direct_analysis", "pre_processing", "deep_analysis", "reupload",
        "re_scan"]


def test_mixed_pdf_roundtrip():
    img = np.full((40, 60), 200, np.uint8)
    img[10:20, 10:30] = 0
    pdf = mixed_pdf([("text", ["hello world", "second line"]),
                     ("image", img),
                     ("text", ["third page"])])
    text, _ = pdfread.extract_text(pdf)
    assert text == "hello world\nsecond line\n\nthird page"
    imgs = pdfread.page_images(pdf)
    assert [len(p) for p in imgs] == [0, 1, 0]
    assert np.array_equal(imgs[1][0], img)


def test_selective_reprocess_counts_and_roundtrip():
    text = "the quick brown fox jumps over the lazy dog " * 40
    payload, _ = build_from_text(text, shuffle_key=3)
    n_pages = len(minipdf.decode(payload))
    assert n_pages > 1
    verdicts = [KEYS[(7 + i) % 5] for i in range(n_pages)]
    r = selective_reprocess(payload, verdicts)
    assert r["total_pages"] == n_pages
    assert r["n_processed"] == sum((7 + i) % 5 in (1, 2)
                                   for i in range(n_pages))
    assert r["n_skipped"] == n_pages - r["n_processed"]
    assert r["roundtrip_ok"]
    # output really is a parseable real PDF with that page mix
    imgs = pdfread.page_images(r["processed_pdf"])
    assert sum(1 for p in imgs if p) == r["n_processed"]


def test_skipped_pages_survive_byte_identical():
    """All-direct verdicts → pure text passthrough: the mixed PDF's
    extraction equals the MINIPDF walk text page-for-page."""
    text = "alpha beta gamma delta epsilon zeta " * 30
    payload, expected = build_from_text(text, shuffle_key=5)
    pages = sorted(minipdf.decode(payload), key=lambda p: p["page_num"])
    r = selective_reprocess(payload, ["direct_analysis"] * len(pages))
    assert r["n_processed"] == 0 and r["roundtrip_ok"]
    got, _ = pdfread.extract_text(r["processed_pdf"])
    assert got == expected  # page/line joins collapse identically
