"""JPEG 2000 (ITU-T T.800) restricted-lossless codec tests.

Same verification contract as jbig2/faxg4/minijpeg: encode→decode
exactness on adversarial images, spec anchors, malformed-stream
rejection; cross-implementation interop is out of sandbox scope."""

import numpy as np
import pytest

from documentai_ray.functions.jp2k import (_fwd_53_1d, _inv_53_1d,
                                           _sig_ctx, decode_block,
                                           decode_jp2k, encode_block,
                                           encode_jp2k, fwd_dwt53,
                                           inv_dwt53)


def test_dwt53_1d_roundtrips():
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 4, 5, 8, 17, 64, 101):
        x = rng.integers(-200, 200, size=n).astype(np.int32)
        s, d = _fwd_53_1d(x)
        assert s.shape[0] == (n + 1) // 2 and d.shape[0] == n // 2
        assert np.array_equal(_inv_53_1d(s, d, n), x)


def test_dwt53_2d_roundtrips():
    rng = np.random.default_rng(1)
    for shape in ((1, 1), (2, 2), (5, 7), (16, 16), (33, 47)):
        img = rng.integers(-128, 128, size=shape).astype(np.int32)
        for levels in (0, 1, 2, 3):
            ll, bands = fwd_dwt53(img, levels)
            assert np.array_equal(inv_dwt53(ll, bands), img)


def test_sig_ctx_table_anchors():
    # Table D.1 anchors: zero neighborhood -> 0; full H -> 8 (LL/LH);
    # HL swaps H and V; HH keys off the diagonal sum
    assert _sig_ctx(0, 0, 0, 0) == 0
    assert _sig_ctx(0, 2, 0, 0) == 8
    assert _sig_ctx(1, 0, 2, 0) == 8      # HL: V plays H's role
    assert _sig_ctx(2, 0, 0, 3) == 8
    assert _sig_ctx(2, 0, 0, 0) == 0
    assert _sig_ctx(0, 1, 0, 0) == 5


def test_tier1_block_roundtrips():
    rng = np.random.default_rng(2)
    for shape in ((1, 1), (3, 5), (8, 8), (17, 23), (64, 64)):
        for band in (0, 1, 2):
            for scale in (3, 50, 2000):
                c = rng.integers(-scale, scale,
                                 size=shape).astype(np.int32)
                data, npass, nplanes = encode_block(c, band)
                out = decode_block(data, shape[0], shape[1], band,
                                   nplanes, npass)
                assert np.array_equal(out, c), (shape, band, scale)
    # all-zero block: zero passes, empty data
    data, npass, nplanes = encode_block(np.zeros((8, 8), np.int32), 0)
    assert (data, npass, nplanes) == (b"", 0, 0)


def test_codestream_roundtrips():
    rng = np.random.default_rng(3)
    cases = [rng.integers(0, 256, size=(100, 150)).astype(np.uint8),
             np.full((80, 90), 128, np.uint8),
             np.zeros((33, 47), np.uint8),
             np.full((16, 24), 255, np.uint8)]
    y, x = np.indices((96, 200))
    cases.append(((y * 3 + x * 5) % 256).astype(np.uint8))
    for img in cases:
        for levels in (0, 1, 2):
            enc = encode_jp2k(img, levels=levels)
            assert enc[:2] == b"\xff\x4f" and enc[-2:] == b"\xff\xd9"
            assert np.array_equal(decode_jp2k(enc), img)


def test_malformed_rejection():
    img = np.full((8, 8), 7, np.uint8)
    good = encode_jp2k(img)
    with pytest.raises(ValueError):
        decode_jp2k(b"\x00\x01\x02")            # not a codestream
    with pytest.raises(ValueError):
        decode_jp2k(good[:8])                   # truncated
    rng = np.random.default_rng(4)
    for t in range(100):
        m = bytearray(good)
        if t % 2:
            m[rng.integers(len(m))] ^= 1 << rng.integers(8)
        else:
            m = m[: rng.integers(3, len(m))]
        try:
            decode_jp2k(bytes(m))
        except ValueError:
            pass


def test_pdf_jpx_roundtrip():
    from documentai_ray.functions.pdfread import page_images
    from documentai_ray.functions.pdfwrite import images_to_pdf
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, size=(40, 70)).astype(np.uint8)
    pdf = images_to_pdf([src], image_filter="jpx")
    (page,), = page_images(pdf)
    assert np.array_equal(page, src)


def test_color_rct_roundtrips():
    rng = np.random.default_rng(7)
    for shape in ((1, 1, 3), (5, 7, 3), (16, 24, 3), (65, 80, 3)):
        for levels in (0, 1, 2):
            img = rng.integers(0, 256, size=shape).astype(np.uint8)
            dec = decode_jp2k(encode_jp2k(img, levels=levels))
            assert dec.shape == img.shape
            assert np.array_equal(dec, img), (shape, levels)


def test_color_pdf_reduces_to_bt601_luma():
    from documentai_ray.functions.pdfread import page_images
    from documentai_ray.functions.pdfwrite import images_to_pdf
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, size=(20, 30, 3)).astype(np.uint8)
    pdf = images_to_pdf([src], image_filter="jpx")
    assert b"/DeviceRGB" in pdf
    (page,), = page_images(pdf)
    p32 = src.astype(np.int64)
    luma = ((299 * p32[:, :, 0] + 587 * p32[:, :, 1]
             + 114 * p32[:, :, 2] + 500) // 1000).astype(np.uint8)
    assert np.array_equal(page, luma)


def test_color_requires_jpx_filter():
    from documentai_ray.functions.pdfwrite import images_to_pdf
    src = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="jpx"):
        images_to_pdf([src], image_filter="flate")


def test_jp2_container_unwrap():
    """PDF /JPXDecode streams are often JP2-boxed, not raw codestreams:
    a minimal JP2 wrapper (signature + ftyp + jp2c) must decode."""
    import struct as _st
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    cs = encode_jp2k(img)

    def box(typ, payload):
        return _st.pack(">I", 8 + len(payload)) + typ + payload

    jp2 = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
           + box(b"ftyp", b"jp2 \x00\x00\x00\x00jp2 ")
           + box(b"jp2c", cs))
    assert np.array_equal(decode_jp2k(jp2), img)
    with pytest.raises(ValueError, match="jp2c"):
        decode_jp2k(b"\x00\x00\x00\x0cjP  \r\n\x87\n"
                    + box(b"ftyp", b"jp2 "))


class TestIrreversible97:
    """T.800 irreversible 9/7 path — what LOSSY wild JPX scans use."""

    def test_97_lifting_exact_inverse(self):
        from documentai_ray.functions.jp2k import (_fwd_97_1d,
                                                   _fwd_dwt97,
                                                   _inv_97_1d,
                                                   _inv_dwt97)
        rng = np.random.default_rng(0)
        for n in (2, 3, 4, 5, 8, 17, 64, 101):
            x = rng.normal(size=n)
            s, d = _fwd_97_1d(x)
            assert np.abs(_inv_97_1d(s, d, n) - x).max() < 1e-9
        img = rng.normal(size=(33, 47))
        for levels in (1, 2, 3):
            ll, b = _fwd_dwt97(img, levels)
            assert np.abs(_inv_dwt97(ll, b) - img).max() < 1e-9

    def test_lossy_quality_scales_with_step(self):
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k_lossy)
        yy, xx = np.mgrid[0:40, 0:56]
        smooth = (128 + 60 * np.sin(yy / 9.0)
                  + 50 * np.cos(xx / 11.0)).clip(0, 255).astype(np.uint8)
        psnrs = []
        for be in (8, 10, 12):
            dec = decode_jp2k(encode_jp2k_lossy(smooth, base_exp=be))
            mse = np.mean((dec.astype(float)
                           - smooth.astype(float)) ** 2)
            psnrs.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-9)))
        assert psnrs[0] > 45           # already high quality
        assert psnrs[1] > psnrs[0] + 5  # finer steps keep improving
        assert psnrs[2] > psnrs[1] + 5

    def test_lossy_constant_is_exact_and_gray_markers(self):
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k_lossy)
        const = np.full((32, 40), 77, np.uint8)
        enc = encode_jp2k_lossy(const)
        assert enc[:2] == b"\xff\x4f"
        assert np.array_equal(decode_jp2k(enc), const)

    def test_lossy_pdf_roundtrip_quality(self):
        from documentai_ray.functions.pdfread import page_images
        from documentai_ray.functions.pdfwrite import images_to_pdf
        yy, xx = np.mgrid[0:40, 0:56]
        smooth = (128 + 60 * np.sin(yy / 9.0)
                  + 50 * np.cos(xx / 11.0)).clip(0, 255).astype(np.uint8)
        pdf = images_to_pdf([smooth], image_filter="jpx_lossy")
        (page,), = page_images(pdf)
        mse = np.mean((page.astype(float) - smooth.astype(float)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 45


class TestUnsupportedCodestreamShapes:
    """ADVICE r4: reject progression orders / tile layouts this decoder
    cannot lay out correctly, instead of silently decoding wrong
    pixels."""

    def _stream(self):
        from documentai_ray.functions.jp2k import encode_jp2k
        rng = np.random.RandomState(11)
        return encode_jp2k((rng.rand(20, 28) * 255).astype(np.uint8),
                           levels=1)

    def test_foreign_progression_order_rejected(self):
        from documentai_ray.functions.jp2k import decode_jp2k
        data = bytearray(self._stream())
        i = data.find(b"\xff\x52")  # COD marker
        assert i != -1
        # COD body: Lcod(2) Scod(1) SGcod: prog(1)... — all five real
        # orders are now decoded; only out-of-spec values reject
        data[i + 2 + 2 + 1] = 7
        with pytest.raises(ValueError, match="progression order"):
            decode_jp2k(bytes(data))

    def test_nonzero_tile_index_rejected(self):
        from documentai_ray.functions.jp2k import decode_jp2k
        data = bytearray(self._stream())
        i = data.find(b"\xff\x90")  # SOT marker
        assert i != -1
        data[i + 4] = 0  # Isot high byte
        data[i + 5] = 2  # Isot = 2
        with pytest.raises(ValueError, match="multi-tile"):
            decode_jp2k(bytes(data))

    def test_second_tile_part_in_body_rejected(self):
        from documentai_ray.functions.jp2k import decode_jp2k
        data = self._stream()
        assert data.endswith(b"\xff\xd9")
        # splice a second SOT+SOD right before EOC
        fake = b"\xff\x90" + b"\x00\x0a" + b"\x00\x01" \
            + b"\x00\x00\x00\x0e" + b"\x00\x01" + b"\xff\x93"
        data2 = data[:-2] + fake + b"\xff\xd9"
        with pytest.raises(ValueError, match="multi-tile"):
            decode_jp2k(data2)


class TestDerivedQuantization:
    """Sqcd style 1 (scalar derived, T.800 E.1.1): one (eps, mu) pair,
    per-band exponents expanded as eps_b = max(0, eps_0 -
    floor((b-1)/3))."""

    def _img(self):
        y, x = np.mgrid[0:48, 0:64]
        return (128 + 60 * np.sin(y / 7.0)
                + 50 * np.cos(x / 9.0)).clip(0, 255).astype(np.uint8)

    def test_derived_stream_decodes(self):
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k_lossy)
        img = self._img()
        enc = encode_jp2k_lossy(img, levels=2, derived=True)
        i = enc.find(b"\xff\x5c")
        assert (enc[i + 4] & 0x1F) == 1      # Sqcd style 1 on the wire
        out = decode_jp2k(enc)
        mse = float(np.mean((out.astype(float) - img.astype(float)) ** 2))
        assert 10 * np.log10(255 ** 2 / mse) > 40

    def test_derived_expansion_matches_expounded(self):
        # an expounded stream hand-built with the SAME derived eps
        # pattern must decode identically to the style-1 stream
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k_lossy)
        img = self._img()
        der = encode_jp2k_lossy(img, levels=2, derived=True)
        out_d = decode_jp2k(der)
        # rebuild as expounded carrying the expansion explicitly
        import struct as _st
        from documentai_ray.functions.jp2k import _GUARD_BITS
        i = der.find(b"\xff\x5c")
        e0 = der[i + 5] >> 3
        eps = [e0] + [max(0, e0 - k // 3) for k in range(6)]
        qcd = _st.pack(">HB", 3 + 2 * len(eps),
                       0x02 | (_GUARD_BITS << 5))
        for e in eps:
            qcd += _st.pack(">H", e << 11)
        exp = der[:i] + b"\xff\x5c" + qcd + der[i + 2 + 5:]
        assert np.array_equal(decode_jp2k(exp), out_d)


class TestLossyColorICT:
    """3-component 9/7 via the irreversible color transform (T.800
    G.2/G.3): one packet per component per resolution, MCT=1."""

    def _rgb(self):
        y, x = np.mgrid[0:40, 0:56]
        return np.dstack([(128 + 60 * np.sin(y / 7.0)).clip(0, 255),
                          (128 + 60 * np.cos(x / 9.0)).clip(0, 255),
                          (y * 3 + x * 2) % 256]).astype(np.uint8)

    @pytest.mark.parametrize("derived", [False, True])
    def test_color_97_psnr(self, derived):
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k_lossy)
        rgb = self._rgb()
        out = decode_jp2k(encode_jp2k_lossy(rgb, levels=2,
                                            derived=derived))
        assert out.shape == rgb.shape
        mse = float(np.mean((out.astype(float) - rgb.astype(float)) ** 2))
        assert 10 * np.log10(255 ** 2 / mse) > 40

    def test_pdf_embed_path(self):
        from documentai_ray.functions.pdfread import page_images
        from documentai_ray.functions.pdfwrite import images_to_pdf
        rgb = self._rgb()
        pdf = images_to_pdf([rgb], image_filter="jpx_lossy")
        (got,), = page_images(pdf)
        # color strips reduce to BT.601 luma in page_images
        p32 = rgb.astype(np.int64)
        luma = ((299 * p32[:, :, 0] + 587 * p32[:, :, 1]
                 + 114 * p32[:, :, 2] + 500) // 1000).astype(np.uint8)
        err = np.abs(got.astype(int) - luma.astype(int)).max()
        assert got.shape == luma.shape and err <= 4


class TestMultiComponentAlpha:
    """2- and 4-component codestreams (gray+alpha / RGBA): direct
    components, no MCT — lossless bit-exact."""

    @pytest.mark.parametrize("nc", [2, 4])
    def test_lossless_roundtrip(self, nc):
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k)
        rng = np.random.RandomState(3)
        img = (rng.rand(30, 44, nc) * 255).astype(np.uint8)
        out = decode_jp2k(encode_jp2k(img, levels=2))
        assert out.shape == img.shape and np.array_equal(out, img)


class TestProgressionOrders:
    """All five T.800 progression orders on single-layer whole-precinct
    streams: LRCP/RLCP/RPCL are resolution-major, PCRL/CPRL
    component-major — every one decodes bit-exactly."""

    @pytest.mark.parametrize("prog", [0, 1, 2, 3, 4])
    def test_lossless_roundtrip_all_orders(self, prog):
        from documentai_ray.functions.jp2k import (decode_jp2k,
                                                   encode_jp2k)
        rng = np.random.RandomState(3)
        for img in ((rng.rand(20, 28) * 255).astype(np.uint8),
                    (rng.rand(30, 44, 3) * 255).astype(np.uint8),
                    (rng.rand(22, 31, 4) * 255).astype(np.uint8)):
            out = decode_jp2k(encode_jp2k(img, levels=2, prog=prog))
            assert np.array_equal(out, img)

    def test_unknown_order_rejected(self):
        from documentai_ray.functions.jp2k import decode_jp2k, encode_jp2k
        rng = np.random.RandomState(3)
        enc = bytearray(encode_jp2k(
            (rng.rand(20, 28, 3) * 255).astype(np.uint8)))
        i = enc.find(b"\xff\x52")
        enc[i + 2 + 2 + 1] = 7   # invalid order
        with pytest.raises(ValueError, match="progression order"):
            decode_jp2k(bytes(enc))


def test_empty_packet_decodes_as_zero_bands():
    """B.10.3 empty packets (header bit 0): every band of the packet
    decodes all-zero; the packet body is the single aligned byte."""
    from documentai_ray.functions.jp2k import decode_jp2k, encode_jp2k
    rng = np.random.RandomState(3)
    cells = (rng.rand(4, 4) * 255).astype(np.uint8)
    img = np.repeat(np.repeat(cells, 2, 0), 2, 1)
    enc = encode_jp2k(img, levels=1)
    i = enc.find(b"\xff\x93") + 2
    body = enc[i:-2]
    # replace the detail packet with the 1-byte empty packet; find the
    # LL/detail boundary by scanning for the first decodable cut
    for cut in range(1, len(body)):
        cand = enc[:i] + body[:cut] + b"\x00" + b"\xff\xd9"
        try:
            out = decode_jp2k(cand)
        except ValueError:
            continue
        assert out.shape == img.shape
        break
    else:
        raise AssertionError("no empty-packet variant decoded")
