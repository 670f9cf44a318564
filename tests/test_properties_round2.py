"""Property-based invariants for the round-2 operators (hypothesis).

Pure-function properties only — the Ray-pipeline variants of these ops are
covered by unit tests and the DuckDB oracle; here we fuzz the kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5),
                 min_size=0, max_size=60)


@given(WORDS, st.integers(2, 10), st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_chunks_cover_every_token(words, window, stride):
    """Coverage holds for the overlap contract stride <= window (stride >
    window deliberately skips tokens and is out of contract)."""
    from documentai_ray.stages.curation import chunk_tokens

    stride = min(stride, window)
    n = len(" ".join(words).split(" "))  # includes the empty-token case
    n_chunks = chunk_tokens(n, window, stride)
    starts = [k * stride for k in range(n_chunks)]
    # every token index is inside at least one [s, s+window) chunk
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + window, n)))
    assert covered == set(range(n))
    # and the last chunk is not redundant: it contains the final token
    assert starts[-1] < n


@given(st.lists(st.integers(1, 40), min_size=1, max_size=50),
       st.integers(5, 60))
@settings(max_examples=60, deadline=None)
def test_pack_greedy_capacity_invariant(costs, budget):
    """Replaying the greedy recurrence: bin sums never exceed budget (for
    capped costs) and bin ids are contiguous from 0."""
    capped = [min(c, budget) for c in costs]
    sums: dict[int, int] = {}
    b, cum = 0, 0
    for i, c in enumerate(capped):
        if i == 0:
            cum = c
        elif cum + c > budget:
            b += 1
            cum = c
        else:
            cum += c
        sums[b] = sums.get(b, 0) + c
    assert all(v <= budget for v in sums.values())
    assert sorted(sums) == list(range(b + 1))


@given(st.lists(st.text(alphabet="ab \n", max_size=12), min_size=1,
                max_size=20))
@settings(max_examples=60, deadline=None)
def test_c4_filter_idempotent(lines):
    from documentai_ray.stages.lines import c4_filter_text

    text = "\n".join(lines)
    once, k1, _ = c4_filter_text(text)
    twice, k2, n2 = c4_filter_text(once)
    assert twice == once
    assert k2 == n2 or once == ""  # every surviving line survives again


@given(st.text(alphabet="abc déè\t\n", max_size=80))
@settings(max_examples=80, deadline=None)
def test_normalize_idempotent(text):
    from documentai_ray.stages.curation import normalize_text

    once = normalize_text(text)
    assert normalize_text(once) == once
    assert not once.startswith(" ") and not once.endswith(" ")
    assert "  " not in once and "\t" not in once and "\n" not in once


@given(st.lists(st.integers(0, 1 << 62), min_size=0, max_size=300),
       st.integers(2, 64))
@settings(max_examples=60, deadline=None)
def test_kmv_exact_iff_below_k(hashes, k):
    from documentai_ray.stages.sketches import kmv_estimate

    arr = np.array(hashes, np.uint64)
    n_distinct = len(np.unique(arr))
    n_kept, est = kmv_estimate(arr, k)
    if n_distinct < k:
        assert (n_kept, est) == (n_distinct, n_distinct)
    else:
        assert n_kept == k and est >= 1


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=200),
       st.lists(st.integers(-60, 60), min_size=1, max_size=30))
@settings(max_examples=40, deadline=None)
def test_interval_join_matches_bruteforce(ts_vals, starts):
    """interval_join's searchsorted window == O(n·m) brute force."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR")
    from documentai_ray.stages.joins import interval_join

    iv = pd.DataFrame({
        "interval_id": range(len(starts)),
        "start": starts,
        "end": [s + 1 + abs(s) % 7 for s in starts],
    })
    t = pa.table({"rid": pa.array(range(len(ts_vals)), pa.int64()),
                  "ts": pa.array(ts_vals, pa.int64())})
    out = interval_join(ray.data.from_arrow(t), iv, ts_col="ts").to_pandas()
    expect_empty = not any(s <= tv < e for tv in ts_vals
                           for s, e in zip(iv["start"], iv["end"]))
    if len(out) == 0:
        # Ray's to_pandas drops columns on a fully-empty dataset
        assert expect_empty
        return
    got = set(zip(out["rid"], out["interval_id"]))
    expect = {(r, i) for r, tv in enumerate(ts_vals)
              for i, (s, e) in enumerate(zip(iv["start"], iv["end"]))
              if s <= tv < e}
    assert got == expect


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_jpeg_roundtrip_psnr_fuzz(h, w, seed):
    from documentai_ray.functions.minijpeg import (decode_gray_jpeg,
                                                   encode_gray_jpeg)

    rng = np.random.RandomState(seed)
    # smooth-ish content (JPEG's operating regime): low-freq ramp + noise
    y, x = np.mgrid[0:h, 0:w]
    img = np.clip(128 + 40 * np.sin(y / 7.0) + 30 * np.cos(x / 9.0)
                  + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
    out = decode_gray_jpeg(encode_gray_jpeg(img))
    assert out.shape == (h, w)
    mse = ((img.astype(float) - out.astype(float)) ** 2).mean()
    assert mse < 200  # PSNR > ~25 dB on smooth content


@given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_tiff_roundtrip_lossless_fuzz(h, w, seed):
    from documentai_ray.functions.minitiff import (decode_gray_tiff,
                                                   encode_gray_tiff)

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w), np.uint8)
    assert (decode_gray_tiff(encode_gray_tiff(img)) == img).all()


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=33,
                                               max_codepoint=126),
                        min_size=1, max_size=7),
                min_size=1, max_size=20))
@settings(max_examples=40, deadline=None)
def test_ocr_roundtrip_fuzz(words):
    """Any printable-ASCII word sequence must survive render → OCR
    byte-identically (within one page)."""
    from documentai_ray.functions.minipdf import build_from_text
    from documentai_ray.functions.raster import rasterize_first_page
    from documentai_ray.stages.ocr import ocr_image

    text = " ".join(words[:96])
    payload, expected = build_from_text(text, shuffle_key=1)
    got, _ = ocr_image(rasterize_first_page(payload, glyphs=True))
    assert got == expected
