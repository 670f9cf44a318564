"""Real PDF writer (K2) and base64 emitter (K5)."""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa


def test_pdf_roundtrip_and_offsets():
    from documentai_ray.functions.pdfwrite import images_to_pdf, validate

    imgs = [np.arange(48, dtype=np.uint8).reshape(6, 8),
            np.full((4, 5), 200, np.uint8)]
    pdf = images_to_pdf(imgs)
    assert pdf.startswith(b"%PDF-1.4\n") and pdf.endswith(b"%%EOF\n")
    back = validate(pdf)  # raises if any xref offset is wrong
    assert len(back) == 2
    assert (back[0] == imgs[0]).all() and (back[1] == imgs[1]).all()


def test_pdf_deterministic():
    from documentai_ray.functions.pdfwrite import images_to_pdf

    imgs = [np.zeros((3, 3), np.uint8)]
    assert images_to_pdf(imgs) == images_to_pdf(imgs)


def test_pdf_validate_catches_corruption():
    import pytest

    from documentai_ray.functions.pdfwrite import images_to_pdf, validate

    pdf = bytearray(images_to_pdf([np.zeros((2, 2), np.uint8)]))
    pdf[10:16] = b"zzzzzz"  # clobber the first object header
    with pytest.raises(ValueError):
        validate(bytes(pdf))


def test_images_to_pdf_stage():
    from documentai_ray.functions import minipng
    from documentai_ray.stages.multimodal import ImagesToPdfStage

    pages = [minipng.encode_gray(np.full((4, 4), v, np.uint8))
             for v in (1, 2, 3)]
    batch = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "pages": pa.array([pages], pa.list_(pa.large_binary())),
    })
    out = ImagesToPdfStage()(batch)
    assert out.column("n_pages").to_pylist() == [3]
    assert out.column("pdf_bytes").to_pylist()[0] == len(
        out.column("pdf").to_pylist()[0])
    from documentai_ray.functions.pdfwrite import validate

    assert len(validate(out.column("pdf").to_pylist()[0])) == 3


def test_base64_emit():
    from documentai_ray.stages.multimodal import base64_emit_batch

    batch = pa.table({"payload": pa.array([b"hello\x00world"],
                                          pa.large_binary())})
    out = base64_emit_batch(batch)
    assert out.column("payload_b64").to_pylist() == [
        base64.b64encode(b"hello\x00world").decode()]
