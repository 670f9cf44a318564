"""MINIPDF rasterizer (real S3 path)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_rasterize_ink_closed_form():
    from documentai_ray.functions.minipdf import build_from_text
    from documentai_ray.functions.raster import rasterize_first_page

    text = "alpha beta gg delta epsilon zeta eta theta iota kappa"
    payload, _ = build_from_text(text, shuffle_key=3)
    img = rasterize_first_page(payload)
    assert img.shape == (792, 612)
    # disjoint 6·len × 10 span boxes -> ink = 60 · Σ len(word)
    expect = 60 * sum(len(w) for w in text.split())
    assert int((img < 255).sum()) == expect


def test_rasterize_first_page_only():
    from documentai_ray.functions.minipdf import build_from_text
    from documentai_ray.functions.raster import rasterize_first_page

    # 200 one-char words -> 96 on page 1, rest on later pages
    text = " ".join("x" for _ in range(200))
    payload, _ = build_from_text(text, shuffle_key=0)
    img = rasterize_first_page(payload)
    assert int((img < 255).sum()) == 60 * 96


def test_rasterize_error_payload():
    from documentai_ray.functions.raster import rasterize_first_page
    from documentai_ray.stages.multimodal import RasterizeStage

    assert rasterize_first_page(b"garbage") is None
    batch = pa.table({"url": ["u"],
                      "html": pa.array([b"garbage"], pa.large_binary())})
    out = RasterizeStage()(batch)
    assert out.column("ink_px").to_pylist() == [0]
    assert out.column("raster_w").to_pylist() == [0]


def test_rasterize_stage_png_roundtrip():
    from documentai_ray.functions.minipdf import build_from_text
    from documentai_ray.functions import minipng
    from documentai_ray.stages.multimodal import RasterizeStage

    payload, _ = build_from_text("one two three", shuffle_key=1)
    batch = pa.table({"url": ["u"],
                      "html": pa.array([payload], pa.large_binary())})
    out = RasterizeStage(emit_png=True)(batch)
    img = minipng.decode_gray(out.column("png").to_pylist()[0])
    assert int((img < 255).sum()) == out.column("ink_px").to_pylist()[0]
    assert img.shape == (792, 612)
