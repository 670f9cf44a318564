"""/ToUnicode CMap text extraction (ISO 32000 §9.10.3): PDFs whose
strings use a custom subset-font byte encoding — meaningless without
the CMap — must extract byte-identically to their plain counterparts.
Covers bfchar, incrementing and array bfranges, 1- and 2-byte
codespaces, non-Latin text, and fonts without a CMap falling back to
the old byte semantics."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.pdfread import (extract_text,
                                              parse_tounicode)
from documentai_ray.functions.pdfwrite import text_to_pdf, text_to_pdf_cmap

LINES = [f"line {i} with some words here and MixedCase Punct-u,a.tion!"
         for i in range(65)]


def test_cmap_extract_byte_identical_and_opaque():
    want = extract_text(text_to_pdf(LINES, shuffle_key=4))[0]
    pdf = text_to_pdf_cmap(LINES, shuffle_key=4)
    assert b"MixedCase" not in pdf  # plaintext truly absent
    assert extract_text(pdf)[0] == want


def test_cmap_nonlatin_text():
    ul = ["αβγ δεζ ηθι", "漢字 テスト ページ", "mixed latin και ελληνικά"]
    want = extract_text(text_to_pdf(ul))[0]
    assert extract_text(text_to_pdf_cmap(ul))[0] == want


def test_parse_tounicode_two_byte_and_ranges():
    cm = parse_tounicode(b"""
1 begincodespacerange <0000> <ffff> endcodespacerange
2 beginbfchar
<0041> <0058>
<0042> <00e9>
endbfchar
2 beginbfrange
<0100> <0102> <0061>
<0200> <0201> [<0041> <0042>]
endbfrange
""")
    assert cm["width"] == 2
    assert cm["map"][0x41] == "X" and cm["map"][0x42] == "é"
    assert [cm["map"][0x100 + k] for k in range(3)] == ["a", "b", "c"]
    assert cm["map"][0x200] == "A" and cm["map"][0x201] == "B"


def test_parse_tounicode_surrogate_pairs():
    # UTF-16BE destinations beyond the BMP (surrogate pairs)
    cm = parse_tounicode(b"1 beginbfchar <01> <d83dde00> endbfchar")
    assert cm["map"][1] == "\U0001f600"


def test_fonts_without_cmap_keep_old_semantics():
    # the plain writer's files go through the same font-resolution path
    # (fonts={'/F1': None}) and must extract exactly as before
    want_lines = ["plain old text"]
    pdf = text_to_pdf(want_lines)
    assert extract_text(pdf)[0] == "plain old text"


def test_oversized_bfrange_rejected():
    with pytest.raises(ValueError, match="oversized"):
        parse_tounicode(
            b"1 beginbfrange <000000> <ffffff> <0041> endbfrange")


def test_cmap_mutation_robustness():
    rng = np.random.RandomState(3)
    base = text_to_pdf_cmap(LINES[:25], shuffle_key=1)
    for t in range(200):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(8, len(m))]
        try:
            extract_text(bytes(m))
        except ValueError:
            pass
