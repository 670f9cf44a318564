"""JBIG2 (ITU-T T.88) generic-region codec tests.

Same verification contract as faxg4/minijpeg: encode→decode exactness
on adversarial bitmaps, spec-table anchors, malformed-stream rejection;
cross-implementation interop is out of sandbox scope (no reference
codec in the container)."""

import struct

import numpy as np
import pytest

from documentai_ray.functions.jbig2 import (CtxState, MQDecoder, MQEncoder,
                                            _QE, decode_generic_region,
                                            encode_generic_region,
                                            jbig2_decode, jbig2_encode)


def test_qe_table_spec_anchors():
    # published T.88 Table E.1 anchors
    assert len(_QE) == 47
    assert _QE[0] == (0x5601, 1, 1, 1)
    assert _QE[46] == (0x5601, 46, 46, 0)
    assert _QE[45][0] == 0x0001


def test_mq_coder_bit_roundtrip():
    rng = np.random.RandomState(9)
    bits = list((rng.rand(5000) < 0.3).astype(int))
    enc = MQEncoder()
    cx = CtxState(1)
    for b in bits:
        enc.encode(cx, int(b))
    data = enc.flush()
    dec = MQDecoder(data)
    cx = CtxState(1)
    got = [dec.decode(cx) for _ in bits]
    assert got == bits


def test_generic_region_roundtrips():
    rng = np.random.RandomState(4)
    for shape in [(1, 1), (3, 5), (17, 23), (64, 64)]:
        for p in (0.05, 0.5, 0.95):
            img = rng.rand(*shape) < p
            enc = encode_generic_region(img)
            assert np.array_equal(
                decode_generic_region(enc, shape[1], shape[0]), img)
    for img in (np.zeros((40, 40), bool), np.ones((40, 40), bool),
                np.indices((33, 47)).sum(0) % 2 == 0):
        h, w = img.shape
        assert np.array_equal(
            decode_generic_region(encode_generic_region(img), w, h), img)


def test_tpgdon_rows_decode():
    """Typical-prediction: encode with a hand-rolled TPGDON encoder
    (LTP bit through context 0x9B25, typical rows skipped) and check
    the decoder's TPGDON path reproduces the bitmap."""
    img = np.zeros((12, 20), bool)
    img[3] = img[4] = img[5] = True       # identical runs -> typical rows
    img[8, 5:15] = True
    img[9, 5:15] = True
    enc = MQEncoder()
    cx_raw = CtxState()  # shared context bank, as in the decoder
    h, w = img.shape
    ltp = 0
    for y in range(h):
        typical = y > 0 and np.array_equal(img[y], img[y - 1])
        enc.encode(cx_raw, 1 if typical != bool(ltp) else 0, 0x9B25)
        if typical != bool(ltp):
            ltp ^= 1
        if ltp:
            continue
        # plain row coding, identical shift registers to the codec
        from documentai_ray.functions.jbig2 import _seed
        r2 = img[y - 2].astype(np.uint8) if y >= 2 else None
        r1 = img[y - 1].astype(np.uint8) if y >= 1 else None
        row = img[y].astype(np.uint8)
        w2 = _seed(r2, 3, w)
        w1 = _seed(r1, 4, w)
        w0 = 0
        for x in range(w):
            ctx = ((w2 & 0x1F) << 11) | ((w1 & 0x7F) << 4) | (w0 & 0xF)
            bit = int(row[x])
            enc.encode(cx_raw, bit, ctx)
            nx2, nx1 = x + 3, x + 4
            w2 = ((w2 << 1) | (int(r2[nx2]) if r2 is not None
                               and nx2 < w else 0)) & 0x1F
            w1 = ((w1 << 1) | (int(r1[nx1]) if r1 is not None
                               and nx1 < w else 0)) & 0x7F
            w0 = ((w0 << 1) | bit) & 0xF
    data = enc.flush()
    out = decode_generic_region(data, w, h, tpgdon=True)
    assert np.array_equal(out, img)


def test_general_at_path_matches_nominal():
    """The general per-pixel context path must agree with the
    shift-register fast path at the nominal AT positions."""
    rng = np.random.RandomState(11)
    img = rng.rand(15, 25) < 0.4
    enc = encode_generic_region(img)
    fast = decode_generic_region(enc, 25, 15)
    # same positions via the general path: perturb the tuple identity
    # (list -> tuple of same values still compares equal, so shift one
    # AT through an equivalent route: pass a list copy that IS nominal
    # -> to force the slow path we need a genuinely different AT; use
    # the fast/general agreement ON NOMINAL via the private helper)
    from documentai_ray.functions.jbig2 import _NOMINAL_AT, MQDecoder as D
    from documentai_ray.functions.jbig2 import _make_general_ctx
    dec = D(enc)
    cx = CtxState()
    pix = _make_general_ctx(_NOMINAL_AT)
    bmp = np.zeros((15, 25), np.uint8)
    for y in range(15):
        for x in range(25):
            bmp[y, x] = dec.decode(cx, pix(bmp, x, y, 25, 15))
    assert np.array_equal(bmp.astype(bool), fast)
    assert np.array_equal(fast, img)


def test_segment_stream_roundtrip_and_rejection():
    img = np.zeros((10, 30), bool)
    img[2:5, 4:26] = True
    for mmr in (False, True):
        seg = jbig2_encode(img, mmr=mmr)
        assert np.array_equal(jbig2_decode(seg), img)
    with pytest.raises(ValueError):
        jbig2_decode(b"")                      # no page
    with pytest.raises(ValueError):
        jbig2_decode(b"\x00" * 5)              # truncated header
    # symbol-dictionary segment type (0) must raise, not fake output
    bad = bytearray(jbig2_encode(img))
    bad[4] = 0x00                              # segment type -> 0
    with pytest.raises(ValueError, match="unsupported|symbol"):
        jbig2_decode(bytes(bad))


def test_mutation_robustness():
    rng = np.random.RandomState(5)
    img = rng.rand(16, 24) < 0.35
    base = jbig2_encode(img)
    for t in range(150):
        m = bytearray(base)
        if t % 2:
            m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        else:
            m = m[:rng.randint(1, len(m))]
        try:
            jbig2_decode(bytes(m))
        except (ValueError, struct.error):
            pass


def test_pdf_roundtrip_both_modes():
    from documentai_ray.functions.pdfread import page_images
    from documentai_ray.functions.pdfwrite import images_to_pdf
    src = np.full((18, 60), 255, np.uint8)
    src[3:7, 5:50] = 0
    src[12, ::2] = 0
    for filt in ("jbig2", "jbig2_mmr"):
        pdf = images_to_pdf([src], image_filter=filt)
        (page,), = page_images(pdf)
        assert page.shape == src.shape
        assert np.array_equal(page < 128, src < 128)


def test_tpgdon_encoder_roundtrip_and_wins():
    """Encoder-side TPGDON: identical-row-heavy bitmaps round-trip and
    produce strictly smaller streams than the non-TPGDON coding."""
    img = np.zeros((60, 120), bool)
    img[10, 5:100] = True
    img[30:33, 20:80] = True       # three identical rows
    plain = encode_generic_region(img)
    tp = encode_generic_region(img, tpgdon=True)
    assert np.array_equal(
        decode_generic_region(tp, 120, 60, tpgdon=True), img)
    assert len(tp) < len(plain)
    # segment layer now carries TPGDON
    seg = jbig2_encode(img)
    assert np.array_equal(jbig2_decode(seg), img)
    rng = np.random.RandomState(2)
    noisy = rng.rand(20, 30) < 0.5  # no typical rows: still exact
    assert np.array_equal(
        decode_generic_region(encode_generic_region(noisy, tpgdon=True),
                              30, 20, tpgdon=True), noisy)


class TestSymbolTextRegions:
    """T.88 §6.4/6.5 symbol dictionary + text region (arithmetic)."""

    def test_int_coder_roundtrip(self):
        from documentai_ray.functions.jbig2 import (_OOB, decode_int,
                                                    encode_int)
        vals = ([0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
                 100000, -4436, -100000, _OOB, 7, _OOB, -19] +
                list(range(-40, 40)))
        enc = MQEncoder()
        cx = CtxState(512)
        for v in vals:
            encode_int(enc, cx, v)
        dec = MQDecoder(enc.flush())
        cx = CtxState(512)
        got = [decode_int(dec, cx) for _ in vals]
        assert got == vals

    def test_iaid_roundtrip(self):
        from documentai_ray.functions.jbig2 import (decode_iaid,
                                                    encode_iaid)
        for symcodelen in (1, 3, 6):
            ids = list(range(1 << symcodelen)) * 2
            enc = MQEncoder()
            cx = CtxState(1 << (symcodelen + 1))
            for i in ids:
                encode_iaid(enc, cx, symcodelen, i)
            dec = MQDecoder(enc.flush())
            cx = CtxState(1 << (symcodelen + 1))
            assert [decode_iaid(dec, cx, symcodelen)
                    for _ in ids] == ids

    def test_randomized_pages(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_page, jbig2_decode)
        rng = np.random.RandomState(4)
        for trial in range(15):
            nsym = rng.randint(1, 10)
            symbols = [rng.rand(rng.randint(1, 10),
                                rng.randint(1, 10)) < rng.rand()
                       for _ in range(nsym)]
            pw, ph = 60, 50
            placements = []
            for _ in range(rng.randint(1, 20)):
                si = rng.randint(nsym)
                sh, sw = symbols[si].shape
                placements.append((si, rng.randint(0, pw - sw + 1),
                                   rng.randint(0, ph - sh + 1)))
            seg = encode_symbol_text_page(symbols, placements, pw, ph)
            out = jbig2_decode(seg)
            expect = np.zeros((ph, pw), bool)
            for si, x, y in placements:
                s = symbols[si]
                expect[y:y + s.shape[0], x:x + s.shape[1]] |= s
            assert np.array_equal(out, expect), trial

    def test_glyph_page_ocr_byte_identity(self):
        from documentai_ray.functions.bitfont import (CELL_W, GLYPH_H,
                                                      GLYPHS)
        from documentai_ray.functions.pdfread import page_images
        from documentai_ray.functions.pdfwrite import (jbig2_text_pdf,
                                                       wrap_text_lines)
        from documentai_ray.stages.ocr import ocr_image
        src = ("the quick brown fox jumps over the lazy dog "
               "0123456789 " * 3).strip()
        lines = wrap_text_lines(src)
        w = max(len(ln) for ln in lines) * CELL_W + 8
        h = len(lines) * (GLYPH_H + 3) + 8
        chars = sorted({c for ln in lines for c in ln
                        if c != " " and c in GLYPHS})
        sym_of = {c: i for i, c in enumerate(chars)}
        symbols = [GLYPHS[c] for c in chars]
        placements = [(sym_of[ch], 4 + i * CELL_W,
                       4 + r * (GLYPH_H + 3))
                      for r, ln in enumerate(lines)
                      for i, ch in enumerate(ln) if ch != " "]
        pdf = jbig2_text_pdf(symbols, placements, w, h)
        (scan,), = page_images(pdf)
        text, _ = ocr_image(scan)
        assert text == "\n".join(lines)

    def test_mutation_robustness_symbol(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_page, jbig2_decode)
        rng = np.random.RandomState(6)
        symbols = [rng.rand(6, 5) < 0.5, rng.rand(6, 4) < 0.5]
        base = encode_symbol_text_page(
            symbols, [(0, 1, 1), (1, 10, 1), (0, 20, 8)], 30, 16)
        for t in range(150):
            m = bytearray(base)
            if t % 2:
                m[rng.randint(len(m))] ^= 1 << rng.randint(8)
            else:
                m = m[:rng.randint(1, len(m))]
            try:
                jbig2_decode(bytes(m))
            except (ValueError, struct.error):
                pass


class TestRefinementRegions:
    """T.88 §6.3 generic refinement (types 40/42/43): the residual
    pass after lossy symbol classification."""

    def test_raw_refinement_roundtrips(self):
        from documentai_ray.functions.jbig2 import (
            decode_refinement_region, encode_refinement_region)
        rng = np.random.RandomState(3)
        for shape in ((1, 1), (8, 12), (20, 33)):
            ref = rng.rand(*shape) < 0.4
            tgt = ref ^ (rng.rand(*shape) < 0.08)
            enc = encode_refinement_region(tgt, ref)
            out = decode_refinement_region(enc, shape[1], shape[0],
                                           ref)
            assert np.array_equal(out, tgt), shape
        # identical target over STRUCTURED content compresses to almost
        # nothing (few distinct contexts -> fast MPS adaptation; random
        # noise dilutes across the 2^13 contexts and stays larger)
        ref = np.zeros((30, 40), bool)
        ref[5:12, 4:30] = True
        ref[20, ::3] = True
        assert len(encode_refinement_region(ref, ref)) < 40

    def test_lossy_capture_then_exact_fix(self):
        from documentai_ray.functions.jbig2 import (
            append_refinement_segment, jbig2_decode, jbig2_encode)
        rng = np.random.RandomState(5)
        clean = np.zeros((24, 40), bool)
        clean[4:9, 5:35] = True
        clean[15, ::2] = True
        noisy = clean ^ (rng.rand(*clean.shape) < 0.05)
        stream = jbig2_encode(noisy)
        fixed = append_refinement_segment(stream, clean, 0, 0)
        assert np.array_equal(jbig2_decode(fixed), clean)
        assert not np.array_equal(jbig2_decode(stream), clean)

    def test_refinement_rejects_bad_geometry(self):
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode)
        img = np.zeros((8, 8), bool)
        stream = bytearray(jbig2_encode(img))
        # fabricate a refinement segment pointing outside the page
        import struct as _st
        body = (_st.pack(">IIIIB", 4, 4, 100, 100, 0) + b"\x00"
                + _st.pack("bbbb", -1, -1, -1, -1) + b"\x00")
        hdr = (_st.pack(">IB", 9, 43) + b"\x00" + _st.pack(">B", 1)
               + _st.pack(">I", len(body)))
        with pytest.raises(ValueError, match="outside|implausible"):
            jbig2_decode(bytes(stream) + hdr + body)


class TestHalftoneRegions:
    """T.88 §6.6/6.7 pattern dictionaries + halftone regions."""

    def test_pattern_dict_roundtrip(self):
        from documentai_ray.functions.jbig2 import (decode_pattern_dict,
                                                    encode_pattern_dict)
        rng = np.random.RandomState(2)
        pats = [rng.rand(5, 7) < p for p in (0.1, 0.4, 0.7, 0.95)]
        got = decode_pattern_dict(encode_pattern_dict(pats))
        assert len(got) == 4
        for a, b in zip(got, pats):
            assert np.array_equal(a, b)

    def test_halftone_page_roundtrip(self):
        from documentai_ray.functions.jbig2 import (encode_halftone_page,
                                                    jbig2_decode)
        rng = np.random.RandomState(3)
        # classic clustered-dot dither levels
        pats = [np.zeros((4, 4), bool) for _ in range(4)]
        pats[1][1::2, ::2] = True
        pats[2][::2, :] = True
        pats[3][:, :] = True
        gray = rng.randint(0, 4, size=(6, 10))
        seg = encode_halftone_page(pats, gray, 40, 24)
        out = jbig2_decode(seg)
        expect = np.zeros((24, 40), bool)
        for m in range(6):
            for n in range(10):
                expect[m * 4:(m + 1) * 4,
                       n * 4:(n + 1) * 4] |= pats[int(gray[m, n])]
        assert np.array_equal(out, expect)
        # 8-level grid exercises 3 gray-code bitplanes
        pats8 = [np.zeros((3, 3), bool) for _ in range(8)]
        for i in range(1, 8):
            p = pats8[i]
            p.flat[:i + 1] = True
        gray8 = rng.randint(0, 8, size=(5, 5))
        seg8 = encode_halftone_page(pats8, gray8, 15, 15)
        out8 = jbig2_decode(seg8)
        expect8 = np.zeros((15, 15), bool)
        for m in range(5):
            for n in range(5):
                expect8[m * 3:(m + 1) * 3,
                        n * 3:(n + 1) * 3] |= pats8[int(gray8[m, n])]
        assert np.array_equal(out8, expect8)

    def test_halftone_rejections(self):
        from documentai_ray.functions.jbig2 import (encode_halftone_page,
                                                    jbig2_decode)
        pats = [np.zeros((2, 2), bool), np.ones((2, 2), bool)]
        seg = bytearray(encode_halftone_page(
            pats, np.zeros((2, 2), int), 8, 8))
        # drop the referred-to pattern dict -> halftone must raise
        import struct as _st
        # flip the halftone segment's referred number to a missing one
        idx = seg.find(_st.pack(">IB", 2, 23))
        assert idx >= 0
        seg[idx + 6] = 99              # refs=[99] (nonexistent)
        with pytest.raises(ValueError, match="without patterns"):
            jbig2_decode(bytes(seg))


class TestMalformedStreamContract:
    """ADVICE r4: truncated wild headers surface as ValueError (the
    malformed-stream contract), and a default-1 page is rejected
    explicitly instead of decoding inverted."""

    def _stream(self):
        from documentai_ray.functions.jbig2 import jbig2_encode
        rng = np.random.RandomState(7)
        return jbig2_encode(rng.rand(24, 32) > 0.5)

    def test_truncated_header_raises_valueerror(self):
        from documentai_ray.functions.jbig2 import jbig2_decode
        data = self._stream()
        for cut in (3, 7, 9, 12, len(data) // 2, len(data) - 1):
            with pytest.raises(ValueError):
                jbig2_decode(data[:cut])

    def test_default_pixel_one_page_honored(self):
        # ADVICE r4 asked honor-or-reject; with external combination
        # operators in place the page default pixel is now HONORED:
        # an all-ones page with an AND/XNOR/REPLACE region decodes to
        # exactly the region content
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode)
        img = np.zeros((10, 30), bool)
        img[2:5, 4:26] = True
        data = bytearray(jbig2_encode(img))
        data[11 + 16] |= 0x04        # page default pixel = 1
        off2 = 11 + 19               # past the 19-byte page info
        for op in (1, 3, 4):         # AND / XNOR / REPLACE
            data[off2 + 11 + 16] = (data[off2 + 11 + 16] & ~7) | op
            assert np.array_equal(jbig2_decode(bytes(data)), img), op
        # OR onto all-ones stays all-ones (the op semantics, honored)
        data[off2 + 11 + 16] &= ~7
        assert jbig2_decode(bytes(data)).all()


class TestGlobalsStreams:
    """JBIG2Globals shared symbol-dictionary layout (T.88 embedding /
    ISO 32000 §7.4.7) — VERDICT r4 #1: one dictionary in a Globals
    stream, per-page text regions referencing it."""

    def _fixture(self):
        rng = np.random.RandomState(5)
        syms = [rng.rand(9, 6) > 0.45 for _ in range(8)]
        pages = [([(i % 8, 5 + 9 * i, 12) for i in range(9)], 120, 60),
                 ([(7 - i % 8, 3 + 8 * i, 25) for i in range(11)],
                  110, 70)]
        return syms, pages

    def test_globals_roundtrip_equals_single_stream(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_globals, encode_symbol_text_page,
            jbig2_decode)
        syms, pages = self._fixture()
        g, streams = encode_symbol_text_globals(syms, pages)
        for (pl, w, h), s in zip(pages, streams):
            got = jbig2_decode(s, globals_data=g)
            want = jbig2_decode(encode_symbol_text_page(syms, pl, w, h))
            assert np.array_equal(got, want)

    def test_page_stream_without_globals_raises(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_globals, jbig2_decode)
        syms, pages = self._fixture()
        _g, streams = encode_symbol_text_globals(syms, pages)
        with pytest.raises(ValueError, match="without symbol dict"):
            jbig2_decode(streams[0])

    def test_globals_pdf_roundtrip(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_globals, jbig2_decode)
        from documentai_ray.functions.pdfread import page_images
        from documentai_ray.functions.pdfwrite import jbig2_globals_pdf
        syms, pages = self._fixture()
        pdf = jbig2_globals_pdf(syms, pages)
        assert pdf.count(b"/JBIG2Globals") == 2  # one ref per page
        imgs = page_images(pdf)
        assert [im[0].shape for im in imgs] == [(60, 120), (70, 110)]
        g, streams = encode_symbol_text_globals(syms, pages)
        for k in range(2):
            ink = jbig2_decode(streams[k], globals_data=g)
            assert np.array_equal(imgs[k][0],
                                  ((~ink) * 255).astype(np.uint8))

    def test_globals_pdf_is_flate_wrapped(self):
        # the Globals stream itself rides the standard filter chain
        from documentai_ray.functions.pdfwrite import jbig2_globals_pdf
        syms, pages = self._fixture()
        pdf = jbig2_globals_pdf(syms, pages)
        i = pdf.find(b"/FlateDecode")
        assert i != -1

    def test_decode_stream_without_object_map_raises(self):
        from documentai_ray.functions.pdfread import decode_stream
        dct = (b"<< /Filter /JBIG2Decode /DecodeParms "
               b"<< /JBIG2Globals 3 0 R >> >>")
        with pytest.raises(ValueError, match="object map"):
            decode_stream(dct, b"\x00" * 16)

    def test_dangling_globals_reference_raises(self):
        from documentai_ray.functions.pdfread import decode_stream
        dct = (b"<< /Filter /JBIG2Decode /DecodeParms "
               b"<< /JBIG2Globals 3 0 R >> >>")
        with pytest.raises(ValueError, match="dangling"):
            decode_stream(dct, b"\x00" * 16, {})


class TestHuffmanVariants:
    """SDHUFF/SBHUFF Huffman coding (T.88 Annex B + §6.5.9 +
    §7.4.3.1.7) — VERDICT r4 #3."""

    def test_standard_tables_roundtrip_and_kraft(self):
        from documentai_ray.functions.jbig2 import (_OOB, _BitReader,
                                                    _BitWriter,
                                                    _std_table)
        for tn in (1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 13):
            t = _std_table(tn)  # Kraft bound asserted at construction
            vals = []
            for kind, low, rl, _l, _c in t.encode_map:
                if kind == "norm":
                    vals += [low, low + (1 << rl) - 1]
                elif kind == "upper":
                    vals += [low, low + 99999]
                elif kind == "lower":
                    vals += [low, low - 99999]
                else:
                    vals.append(_OOB)
            w = _BitWriter()
            for v in vals:
                t.encode(w, v)
            r = _BitReader(w.flush())
            assert [t.decode(r) for _ in vals] == vals, tn

    def test_fs_standard_tables_raise(self):
        from documentai_ray.functions.jbig2 import _std_table
        for tn in (6, 7):
            with pytest.raises(ValueError, match="custom table"):
                _std_table(tn)

    def test_custom_table_segment_roundtrip(self):
        from documentai_ray.functions.jbig2 import (_OOB, _BitReader,
                                                    _BitWriter,
                                                    decode_table_segment,
                                                    encode_table_segment)
        seg = encode_table_segment([(-64, 2, 6), (0, 1, 3), (8, 3, 7)],
                                   lower_pl=5, upper_pl=5, oob_pl=5)
        t = decode_table_segment(seg)
        vals = [-64, -1, 0, 7, 8, 135, 136, 9999, -65, -500, _OOB]
        w = _BitWriter()
        for v in vals:
            t.encode(w, v)
        r = _BitReader(w.flush())
        assert [t.decode(r) for _ in vals] == vals

    def _fixture(self):
        rng = np.random.RandomState(9)
        syms = [rng.rand(5 + i // 4, 4 + i % 5) > 0.5 for i in range(23)]
        pl = [(i, 3 + 11 * (i % 9), 2 + 9 * (i // 9)) for i in range(23)]
        return syms, pl

    def test_huffman_decodes_identical_to_arithmetic(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_page, jbig2_decode)
        syms, pl = self._fixture()
        a = jbig2_decode(encode_symbol_text_page(syms, pl, 120, 60))
        h = jbig2_decode(encode_symbol_text_page(syms, pl, 120, 60,
                                                 huffman=True))
        assert np.array_equal(a, h)

    def test_mmr_collective_bitmaps(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_page, jbig2_decode)
        syms, pl = self._fixture()
        a = jbig2_decode(encode_symbol_text_page(syms, pl, 120, 60))
        m = jbig2_decode(encode_symbol_text_page(
            syms, pl, 120, 60, huffman=True, mmr_collective=True))
        assert np.array_equal(a, m)

    def test_single_symbol_edge(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_page, jbig2_decode)
        sym = np.ones((4, 3), bool)
        out = jbig2_decode(encode_symbol_text_page(
            [sym], [(0, 2, 2), (0, 10, 2)], 20, 10, huffman=True))
        assert out[2:6, 2:5].all() and out[2:6, 10:13].all()

    def test_huffman_globals(self):
        from documentai_ray.functions.jbig2 import (
            encode_symbol_text_globals, jbig2_decode)
        syms, pl = self._fixture()
        pages = [(pl, 120, 60), (pl[:11], 120, 40)]
        ga, sa = encode_symbol_text_globals(syms, pages)
        gh, sh = encode_symbol_text_globals(syms, pages, huffman=True)
        for k in range(2):
            assert np.array_equal(jbig2_decode(sa[k], globals_data=ga),
                                  jbig2_decode(sh[k], globals_data=gh))


class TestExoticRegionVariants:
    """r4 gap list #3: GB templates 1-3 (generic + symbol dicts),
    transposed text regions, striped pages, TPGRON refinement."""

    def _img(self):
        rng = np.random.RandomState(3)
        img = rng.rand(40, 56) > 0.6
        img[5:8, 3:40] = True
        return img

    @pytest.mark.parametrize("t", [0, 1, 2, 3])
    def test_generic_templates_roundtrip(self, t):
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode)
        img = self._img()
        assert np.array_equal(jbig2_decode(jbig2_encode(img, template=t)),
                              img)

    @pytest.mark.parametrize("t", [1, 2, 3])
    def test_symbol_dict_templates(self, t):
        from documentai_ray.functions.jbig2 import (
            _decode_symbol_dict, _encode_symbol_dict_data, _sort_symbols)
        rng = np.random.RandomState(5)
        syms = [rng.rand(7, 4 + i % 4) > 0.5 for i in range(9)]
        ss, _ = _sort_symbols(syms)
        got = _decode_symbol_dict(_encode_symbol_dict_data(ss, template=t))
        assert all(np.array_equal(a, b) for a, b in zip(got, ss))

    def test_transposed_text_region_equals_normal(self):
        import struct
        from documentai_ray.functions.jbig2 import (
            _T_END_OF_PAGE, _T_PAGE_INFO, _encode_symbol_dict_data,
            _encode_text_region_data, _seg_header, _sort_symbols,
            encode_symbol_text_page, jbig2_decode)
        rng = np.random.RandomState(5)
        syms = [rng.rand(6 + i % 3, 5) > 0.5 for i in range(5)]
        pl = [(i % 5, 6 + 9 * i, 4 + 3 * (i % 4)) for i in range(8)]
        ref = jbig2_decode(encode_symbol_text_page(syms, pl, 100, 40))
        ss, remap = _sort_symbols(syms)
        inst = sorted(((remap[si], x, y) for si, x, y in pl),
                      key=lambda t: (t[2], t[1]))
        sd = _encode_symbol_dict_data(ss)
        tr = _encode_text_region_data(inst, ss, 100, 40, transposed=True)
        page_data = struct.pack(">IIIIBH", 100, 40, 0, 0, 0x01, 0)
        out = bytearray()
        out += _seg_header(0, _T_PAGE_INFO, 1, len(page_data)) + page_data
        out += _seg_header(1, 0, 1, len(sd)) + sd
        out += _seg_header(2, 6, 1, len(tr), refs=(1,)) + tr
        out += _seg_header(3, _T_END_OF_PAGE, 1, 0)
        assert np.array_equal(jbig2_decode(bytes(out)), ref)

    @pytest.mark.parametrize("kw", [dict(stripe_h=8),
                                    dict(stripe_h=16, mmr=True),
                                    dict(stripe_h=5, template=2)])
    def test_striped_pages(self, kw):
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode)
        img = self._img()
        got = jbig2_decode(jbig2_encode(img, **kw))
        assert got.shape == img.shape and np.array_equal(got, img)

    def test_striped_trailing_blank_stripe_grows_page(self):
        import struct
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode,
                                                    _parse_segment_headers)
        img = self._img()
        stream = bytearray(jbig2_encode(img, stripe_h=8))
        # append a further EOS claiming 10 extra blank rows
        maxnum = max(n for n, *_ in _parse_segment_headers(bytes(stream)))
        eos = struct.pack(">I", img.shape[0] + 9)
        stream += (struct.pack(">IB", maxnum + 1, 50) + b"\x00"
                   + struct.pack(">B", 1) + struct.pack(">I", 4) + eos)
        got = jbig2_decode(bytes(stream))
        assert got.shape == (img.shape[0] + 10, img.shape[1])
        assert np.array_equal(got[:img.shape[0]], img)
        assert not got[img.shape[0]:].any()

    @pytest.mark.parametrize("tp", [False, True])
    def test_tpgron_refinement_roundtrip(self, tp):
        from documentai_ray.functions.jbig2 import (
            decode_refinement_region, encode_refinement_region)
        rng = np.random.RandomState(9)
        ref = rng.rand(30, 40) > 0.5
        tgt = ref.copy()
        tgt[5, 7] = ~tgt[5, 7]
        tgt[20, 33] = ~tgt[20, 33]
        data = encode_refinement_region(tgt, ref, tpgron=tp)
        assert np.array_equal(
            decode_refinement_region(data, 40, 30, ref, tpgron=tp), tgt)

    def test_tpgron_segment_loop(self):
        from documentai_ray.functions.jbig2 import (
            append_refinement_segment, jbig2_decode, jbig2_encode)
        rng = np.random.RandomState(11)
        base = rng.rand(25, 35) > 0.4
        fix = base.copy()
        fix[3:6, 4:9] = True
        s2 = append_refinement_segment(jbig2_encode(base),
                                       fix[2:10, 2:12], 2, 2,
                                       tpgron=True)
        want = base.copy()
        want[2:10, 2:12] = fix[2:10, 2:12]
        assert np.array_equal(jbig2_decode(s2), want)

    def test_tpgron_skips_typical_pixels(self):
        # the win is skipped per-pixel coder work on mostly-typical
        # windows (byte size barely moves — MQ already codes a
        # ref-equal pixel in ~0 bits); count coder decisions directly
        from documentai_ray.functions import jbig2 as j
        ref = np.zeros((60, 80), bool)
        ref[10:20, 10:70] = True
        tgt = ref.copy()
        tgt[15, 15] = False
        counts = []
        orig = j.MQEncoder.encode
        for tp in (False, True):
            n = 0

            def counting(self, cx, bit, ctx=0):
                nonlocal n
                n += 1
                return orig(self, cx, bit, ctx)

            j.MQEncoder.encode = counting
            try:
                data = j.encode_refinement_region(tgt, ref, tpgron=tp)
            finally:
                j.MQEncoder.encode = orig
            counts.append(n)
            assert np.array_equal(
                j.decode_refinement_region(data, 80, 60, ref,
                                           tpgron=tp), tgt)
        plain_n, tp_n = counts
        assert tp_n < plain_n / 4  # most pixels skipped


class TestMMRHalftone:
    """HDMMR/HMMR=1 (T.88 §C.5): pattern dictionary and halftone
    bitplanes MMR/T.6-coded — one continuous stream for all planes."""

    def _fixture(self):
        rng = np.random.RandomState(6)
        pats = [np.zeros((4, 4), bool) for _ in range(4)]
        pats[1][1:3, 1:3] = True
        pats[2][:, ::2] = True
        pats[3][:] = True
        return pats, rng.randint(0, 4, (6, 9))

    def test_mmr_halftone_equals_arithmetic(self):
        from documentai_ray.functions.jbig2 import (encode_halftone_page,
                                                    jbig2_decode)
        pats, gray = self._fixture()
        a = jbig2_decode(encode_halftone_page(pats, gray, 40, 28))
        m = jbig2_decode(encode_halftone_page(pats, gray, 40, 28,
                                              mmr=True))
        assert np.array_equal(a, m)

    def test_mmr_pattern_dict_roundtrip(self):
        from documentai_ray.functions.jbig2 import (decode_pattern_dict,
                                                    encode_pattern_dict)
        pats, _ = self._fixture()
        got = decode_pattern_dict(encode_pattern_dict(pats, mmr=True))
        assert all(np.array_equal(a, b) for a, b in zip(got, pats))


class TestHalftoneSkip:
    """HENABLESKIP (T.88 §6.6.5.1): the computed skip mask — cells
    placed fully outside the region decode no plane bits."""

    def _fixture(self):
        rng = np.random.RandomState(6)
        pats = [np.zeros((4, 4), bool) for _ in range(4)]
        pats[1][1:3, 1:3] = True
        pats[2][:, ::2] = True
        pats[3][:] = True
        return pats, rng.randint(0, 4, (6, 9))

    def test_skip_renders_identically(self):
        from documentai_ray.functions.jbig2 import (encode_halftone_page,
                                                    jbig2_decode)
        pats, gray = self._fixture()
        for hgx in (-1024, -2048):
            sk = jbig2_decode(encode_halftone_page(
                pats, gray, 40, 28, hgx=hgx, enable_skip=True))
            plain = jbig2_decode(encode_halftone_page(
                pats, gray, 40, 28, hgx=hgx))
            assert np.array_equal(sk, plain)

    def test_skip_stream_is_smaller(self):
        from documentai_ray.functions.jbig2 import encode_halftone_page
        pats, gray = self._fixture()
        sk = encode_halftone_page(pats, gray, 40, 28, hgx=-2048,
                                  enable_skip=True)
        plain = encode_halftone_page(pats, gray, 40, 28, hgx=-2048)
        assert len(sk) <= len(plain)

    def test_skip_with_mmr_rejected(self):
        from documentai_ray.functions.jbig2 import encode_halftone_page
        pats, gray = self._fixture()
        with pytest.raises(ValueError, match="HENABLESKIP"):
            encode_halftone_page(pats, gray, 40, 28, mmr=True,
                                 enable_skip=True)


class TestRefinementTemplate1:
    """GRTEMPLATE=1 (§6.3.5.3): the compact 9-pixel refinement context,
    no AT bytes in the segment header, its own TPGRON LTP context."""

    @pytest.mark.parametrize("tp", [False, True])
    def test_segment_loop(self, tp):
        from documentai_ray.functions.jbig2 import (
            append_refinement_segment, jbig2_decode, jbig2_encode)
        rng = np.random.RandomState(11)
        base = rng.rand(25, 35) > 0.4
        fix = base.copy()
        fix[3:6, 4:9] = True
        s2 = append_refinement_segment(jbig2_encode(base),
                                       fix[2:10, 2:12], 2, 2,
                                       tpgron=tp, template=1)
        want = base.copy()
        want[2:10, 2:12] = fix[2:10, 2:12]
        assert np.array_equal(jbig2_decode(s2), want)

    def test_region_roundtrip(self):
        from documentai_ray.functions.jbig2 import (
            decode_refinement_region, encode_refinement_region)
        rng = np.random.RandomState(4)
        ref = rng.rand(20, 30) > 0.5
        tgt = ref.copy()
        tgt[7, 9] = ~tgt[7, 9]
        data = encode_refinement_region(tgt, ref, template=1)
        assert np.array_equal(
            decode_refinement_region(data, 30, 20, ref, template=1),
            tgt)


class TestRefAggDictionaries:
    """REFAGG=1 symbol dictionaries (§6.5.8.2, single refinement per
    symbol): each new glyph refines an imported or earlier symbol on
    the dictionary's shared MQ stream."""

    def _fixture(self):
        rng = np.random.RandomState(8)
        from documentai_ray.functions.jbig2 import _sort_symbols
        base, _ = _sort_symbols([rng.rand(8, 6) > 0.5 for _ in range(4)])
        variants = []
        for s in base:
            v = s.copy()
            v[2, 1] = ~v[2, 1]
            v[5, 3] = ~v[5, 3]
            variants.append(v)
        return base, variants

    def test_direct_decode(self):
        from documentai_ray.functions.jbig2 import (_decode_symbol_dict,
                                                    encode_refagg_dict)
        base, variants = self._fixture()
        sd = encode_refagg_dict(variants, [0, 1, 2, 3], len(base), base)
        got = _decode_symbol_dict(sd, insyms=base)
        assert all(np.array_equal(a, b) for a, b in zip(got, variants))

    def test_full_stream_with_imported_dict(self):
        import struct as _st
        from documentai_ray.functions.jbig2 import (
            _T_END_OF_PAGE, _T_PAGE_INFO, _encode_symbol_dict_data,
            _encode_text_region_data, _seg_header, encode_refagg_dict,
            jbig2_decode)
        base, variants = self._fixture()
        sdA = _encode_symbol_dict_data(base)
        sdB = encode_refagg_dict(variants, [0, 1, 2, 3],
                                 len(base), base)
        allsyms = base + variants
        pl = [(i, 3 + 8 * i, 2) for i in range(8)]
        tr = _encode_text_region_data(sorted(pl,
                                             key=lambda t: (t[2], t[1])),
                                      allsyms, 80, 14)
        page_data = _st.pack(">IIIIBH", 80, 14, 0, 0, 0x01, 0)
        out = bytearray()
        out += _seg_header(0, _T_PAGE_INFO, 1, len(page_data)) + page_data
        out += _seg_header(1, 0, 1, len(sdA)) + sdA
        out += _seg_header(2, 0, 1, len(sdB), refs=(1,)) + sdB
        out += _seg_header(3, 6, 1, len(tr), refs=(1, 2)) + tr
        out += _seg_header(4, _T_END_OF_PAGE, 1, 0)
        page = jbig2_decode(bytes(out))
        want = np.zeros((14, 80), bool)
        for i, x, y in pl:
            want[y:y + 8, x:x + 6] |= allsyms[i]
        assert np.array_equal(page, want)

    def test_aggregate_ninst_gt1_raises(self):
        # hand-code a dictionary whose first symbol claims
        # REFAGGNINST=2: the (unsupported) aggregate path must raise
        import struct as _st
        from documentai_ray.functions import jbig2 as j
        enc = j.MQEncoder()
        cx_iadh = j.CtxState(512)
        cx_iadw = j.CtxState(512)
        cx_iaai = j.CtxState(512)
        j.encode_int(enc, cx_iadh, 5)   # height class 5
        j.encode_int(enc, cx_iadw, 4)   # first symbol width 4
        j.encode_int(enc, cx_iaai, 2)   # REFAGGNINST = 2
        body = enc.flush()
        at = b"".join(_st.pack("bb", dx, dy)
                      for dx, dy in j._NOMINAL_AT)
        sd = (_st.pack(">H", 0x0002) + at
              + _st.pack("bbbb", -1, -1, -1, -1)
              + _st.pack(">II", 1, 1) + body)
        with pytest.raises(ValueError, match="aggregate"):
            j._decode_symbol_dict(sd)


class TestRefinedTextInstances:
    """REFINE=1 text regions (§6.4.11): instances may refine the
    dictionary glyph in place, including size deltas."""

    def test_refined_instances_roundtrip(self):
        import struct as _st
        from documentai_ray.functions.jbig2 import (
            _T_END_OF_PAGE, _T_PAGE_INFO, _encode_symbol_dict_data,
            _encode_text_region_data, _seg_header, _sort_symbols,
            jbig2_decode)
        rng = np.random.RandomState(8)
        ss, remap = _sort_symbols([rng.rand(8, 6) > 0.5
                                   for _ in range(3)])
        pl = [(0, 2, 2), (1, 12, 2), (2, 22, 2), (0, 32, 2)]
        inst = sorted(((remap[si], x, y) for si, x, y in pl),
                      key=lambda t: (t[2], t[1]))
        mod = ss[inst[1][0]].copy()
        mod[3, 2] = ~mod[3, 2]
        grown = np.zeros((10, 8), bool)
        grown[1:9, 1:7] = ss[inst[3][0]]
        refined = [None, mod, None, grown]
        sd = _encode_symbol_dict_data(ss)
        tr = _encode_text_region_data(inst, ss, 45, 16, refined=refined)
        page_data = _st.pack(">IIIIBH", 45, 16, 0, 0, 0x01, 0)
        out = bytearray()
        out += _seg_header(0, _T_PAGE_INFO, 1, len(page_data)) + page_data
        out += _seg_header(1, 0, 1, len(sd)) + sd
        out += _seg_header(2, 6, 1, len(tr), refs=(1,)) + tr
        out += _seg_header(3, _T_END_OF_PAGE, 1, 0)
        page = jbig2_decode(bytes(out))
        want = np.zeros((16, 45), bool)
        placed = [ss[inst[0][0]], mod, ss[inst[2][0]], grown]
        for (sid, x, y), bmp in zip(inst, placed):
            want[y:y + bmp.shape[0], x:x + bmp.shape[1]] |= bmp
        assert np.array_equal(page, want)


class TestUnknownLengthSegments:
    """§7.2.7 unknown-data-length immediate generic regions (the
    streaming-scanner shape): FF AC terminator + trailing row count;
    MMR unknown-length stays honestly unsupported (its 00 00
    terminator is not locatable without decoding)."""

    def test_arith_unknown_length_roundtrip(self):
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode)
        rng = np.random.RandomState(3)
        img = rng.rand(25, 40) > 0.55
        enc = jbig2_encode(img, unknown_length=True)
        assert b"\xff\xff\xff\xff" in enc
        assert np.array_equal(jbig2_decode(enc), img)

    def test_mmr_unknown_length_raises(self):
        import struct as _st
        from documentai_ray.functions.jbig2 import (jbig2_decode,
                                                    jbig2_encode)
        rng = np.random.RandomState(3)
        enc = bytearray(jbig2_encode(rng.rand(25, 40) > 0.55, mmr=True))
        _st.pack_into(">I", enc, 11 + 19 + 7, 0xFFFFFFFF)
        with pytest.raises(ValueError, match="MMR region"):
            jbig2_decode(bytes(enc))
