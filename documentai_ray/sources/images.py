"""Deterministic synthetic image corpus (PNG payloads) for the image path.

Four archetypes keyed off ``doc_id % 4``, chosen so the oracle-checked
metric subset (brightness / contrast / blank / dark / glare — all derived
from integer pixel sums) has CLOSED FORMS in SQL:

  0 "text page"     white 255, black 0 rows every 8th row (h ∣ 8)
  1 blank page      constant 250
  2 stripes         left half fg = 40+(doc_id%6)·10, right half
                    bg = 200+(doc_id%5)·10 (exact half/half split)
  3 low-contrast    left half 120, right half 136 — contrast 8/255 < 0.13
                    triggers the adaptive percentile stretch

Dims: w = 64 + 8·(doc_id%5), h = 64 + 8·(doc_id%3) — even, divisible
by 8. Every metric mirrors ``stages/imaging.exact_metrics`` op-for-op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from documentai_ray.functions import minipng


def image_dims(doc_id: int) -> tuple[int, int]:
    return 64 + 8 * (doc_id % 5), 64 + 8 * (doc_id % 3)  # (w, h)


def image_for(doc_id: int) -> np.ndarray:
    w, h = image_dims(doc_id)
    m = doc_id % 4
    if m == 0:  # text page: dark line rows on white
        img = np.full((h, w), 255, dtype=np.uint8)
        img[::8, :] = 0
        return img
    if m == 1:  # blank
        return np.full((h, w), 250, dtype=np.uint8)
    if m == 2:  # stripes
        fg = 40 + (doc_id % 6) * 10
        bg = 200 + (doc_id % 5) * 10
        img = np.empty((h, w), dtype=np.uint8)
        img[:, : w // 2] = fg
        img[:, w // 2 :] = bg
        return img
    img = np.empty((h, w), dtype=np.uint8)  # low contrast
    img[:, : w // 2] = 120
    img[:, w // 2 :] = 136
    return img


def png_payload_for(doc_id: int) -> bytes:
    return minipng.encode_gray(image_for(doc_id))


def image_payload_batch(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    """doc ids → (doc_id, payload) PNG rows — the corpus generator as a
    ``map_batches`` stage (same distributed-synthesis pattern as
    sources/pages.py)."""
    ids = batch.column(id_col).to_pylist()
    payloads = [png_payload_for(i) for i in ids]
    return pa.table({id_col: batch.column(id_col),
                     "payload": pa.array(payloads, pa.large_binary())})
