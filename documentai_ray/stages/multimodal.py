"""Multimodal payload stages — opaque binary columns + typed metadata.

Images/audio/video ride through the engine as ``binary`` cells with struct
metadata (the payload-in-cell pattern of SURVEY §2.1 S1-S3). Grayscale PNG
decode is REAL (stdlib minipng codec, functions/minipng.py) — the imaging
metric/preprocess stages (stages/imaging.py) run on actual pixels; other
formats (JPEG/TIFF/audio/video) remain STUBBED (no cv2/PIL/ffmpeg in this
environment — clearly marked below). Everything Ray-side is real and
tested: schema, actor-pool stage shape, batch sizing for wide binary rows,
output layout.

The reference analog is the image path: quality rasterizes pages to
pixmaps (/root/reference/quality_analysis_updated/universal_analyzer.py:37),
preprocessing decodes with cv2 (pre_processing_updated/preprocessing_ops.py),
OCR consumes PIL images (entity_extraction_updated/extractor/base.py:11-17).

Scale notes: binary payloads are MBs per row → stages here must run with
small ``batch_size`` and blocks must stay modest (SURVEY §7.5 risk 3).
``decode_stub=True`` swaps the real decoder for a deterministic fake that
derives metadata from the bytes (so tests are hermetic); wiring a real
decoder is replacing ONE function per modality.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_TYPE = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32()),
     ("format", pa.string())]
)


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decoder → (H, W, 1) grayscale: full-baseline PNG (minipng —
    color/palette/Adam7 reduce to BT.601 luma), general T.81 JPEG
    (minijpeg/jpegdec — progressive, color, restart intervals), and
    grayscale TIFF incl. LZW/PackBits compression (minitiff). Every
    format decodes with stdlib/numpy codecs; only truly exotic variants
    (JPEG-in-TIFF, CMYK JPEG, arithmetic coding) raise from the codec."""
    from documentai_ray.functions import minijpeg, minipng, minitiff

    if minipng.is_png(payload):
        img = minipng.decode_gray(payload)
        return img[:, :, None]
    if minijpeg.is_jpeg(payload):
        return minijpeg.decode_gray_jpeg(payload)[:, :, None]
    if minitiff.is_tiff(payload):
        return minitiff.decode_gray_tiff(payload)[:, :, None]
    raise NotImplementedError(
        "unknown image format (cv2/PIL would be needed); "
        "use decode_stub=True for the deterministic fake"
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: derives a small 'pixel' array from the
    payload bytes (md5-seeded) — stable shape (32, 32, 3)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)


class ImageFeatureStage:
    """Actor-pool stage: decode → feature-extract per batch.

    ``__init__`` is where a real model/codec warms up (once per actor);
    ``__call__`` appends ``img_meta`` (struct) and ``img_features``
    (fixed-size list<float32>: channel means + std — a stand-in for a real
    embedding head). Failure → error record, never a thrown batch."""

    FEATURE_DIM = 6

    def __init__(self, *, decode_stub: bool = True):
        self._decode = _decode_image_stub if decode_stub else _decode_image_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, errors = [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                img = self._decode(payload)
                h, w, c = img.shape
                metas.append({"width": w, "height": h, "channels": c, "format": "stub"})
                f = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1))])
                feats.append([float(x) for x in f])
                errors.append("")
            except Exception as exc:
                metas.append({"width": 0, "height": 0, "channels": 0, "format": ""})
                feats.append([0.0] * self.FEATURE_DIM)
                errors.append(f"{type(exc).__name__}"[:80])
        out = batch.append_column("img_meta", pa.array(metas, IMAGE_META_TYPE))
        out = out.append_column(
            "img_features", pa.array(feats, pa.list_(pa.float32(), self.FEATURE_DIM))
        )
        return out.append_column("decode_error", pa.array(errors, pa.string()))


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (REAL, not a stub): index-map
    sampling — the resize step of the image pipeline (the reference resizes
    pixmaps /4 before metrics, universal_analyzer.py:39)."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


class ImageResizeStage:
    """Actor-pool stage: decode (stub) → resize → re-emit payload bytes +
    new dims. Demonstrates the write-back-processed-payload path (K2)."""

    def __init__(self, width: int = 16, height: int = 16, *, decode_stub: bool = True):
        self.width, self.height = width, height
        self._decode = _decode_image_stub if decode_stub else _decode_image_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, widths, heights = [], [], []
        for p in batch.column("payload").to_pylist():
            img = self._decode(p)
            small = resize_nearest(img, self.width, self.height)
            payloads.append(small.tobytes())
            widths.append(small.shape[1])
            heights.append(small.shape[0])
        out = batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(payloads, pa.binary()),
        )
        out = out.append_column("width", pa.array(widths, pa.int32()))
        return out.append_column("height", pa.array(heights, pa.int32()))


class AudioFrameStage:
    """Actor-pool stage: frame-sample an audio payload into fixed windows.

    WAV payloads decode for REAL (stdlib miniwav, PCM-16 mono) and window
    energies are RMS over ``frame_samples``-sample frames; non-WAV payloads
    fall back to the deterministic byte-slice stub (a real implementation
    for compressed formats needs ffmpeg). Output:
    ``frames`` = list<struct<start_ms:int64, energy:float64>>."""

    FRAME_TYPE = pa.list_(pa.struct([("start_ms", pa.int64()), ("energy", pa.float64())]))

    def __init__(self, frame_ms: int = 1000, bytes_per_frame: int = 256,
                 frame_samples: int = 1024):
        self.frame_ms = frame_ms
        self.bpf = bytes_per_frame
        self.frame_samples = frame_samples

    def _frames_wav(self, payload: bytes) -> list[dict]:
        from documentai_ray.functions import miniwav

        samples, sr = miniwav.decode_pcm16(payload)
        out = []
        fs = self.frame_samples
        for i in range(0, len(samples), fs):
            chunk = samples[i : i + fs].astype(np.float64)
            rms = float(np.sqrt((chunk * chunk).mean())) if chunk.size else 0.0
            out.append({"start_ms": i * 1000 // sr, "energy": rms})
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from documentai_ray.functions import miniwav

        all_frames = []
        for payload in batch.column("payload").to_pylist():
            if miniwav.is_wav(payload):
                all_frames.append(self._frames_wav(payload))
                continue
            frames = []
            for i in range(0, len(payload), self.bpf):
                chunk = payload[i : i + self.bpf]
                energy = float(np.frombuffer(chunk, dtype=np.uint8).mean()) if chunk else 0.0
                frames.append({"start_ms": (i // self.bpf) * self.frame_ms,
                               "energy": energy})
            all_frames.append(frames)
        return batch.append_column("frames", pa.array(all_frames, self.FRAME_TYPE))


class RasterizeStage:
    """REAL S3 path: MINIPDF payload → first-page grayscale raster
    (functions/raster.py) → ink stats + optional PNG write-back so the
    page can enter the image pipeline (minipng → imaging metrics).
    Non-MINIPDF payloads (error rows) emit zeroed dims — the same
    error-row contract as extraction."""

    def __init__(self, payload_col: str = "html", emit_png: bool = False,
                 glyphs: bool = False):
        self.payload_col = payload_col
        self.emit_png = emit_png
        self.glyphs = glyphs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from documentai_ray.functions import minipng
        from documentai_ray.functions.raster import rasterize_first_page

        ink: list[int] = []
        ws: list[int] = []
        hs: list[int] = []
        pngs: list[bytes] = []
        for payload in batch.column(self.payload_col).to_pylist():
            img = rasterize_first_page(payload, glyphs=self.glyphs)
            if img is None:
                ink.append(0)
                ws.append(0)
                hs.append(0)
                pngs.append(b"")
                continue
            ink.append(int((img < 255).sum()))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            pngs.append(minipng.encode_gray(img) if self.emit_png else b"")
        batch = batch.drop_columns([self.payload_col])
        out = batch.append_column("ink_px", pa.array(ink, pa.int64()))
        out = out.append_column("raster_w", pa.array(ws, pa.int64()))
        out = out.append_column("raster_h", pa.array(hs, pa.int64()))
        if self.emit_png:
            out = out.append_column("png", pa.array(pngs, pa.large_binary()))
        return out


class ImagesToPdfStage:
    """REAL images→PDF sink stage (K2): decode each row's PNG page
    payloads (stdlib minipng) and re-bundle them into one genuine PDF 1.4
    document per row (functions/pdfwrite.py — real xref/XObject layout,
    validated by round-trip in tests). Output: ``pdf`` payload +
    ``n_pages`` + ``pdf_bytes``.

    Reference anchor: the gateway's images→PDF re-bundling endpoint
    (img2pdf behind FastAPI); here it is a batch sink stage."""

    def __init__(self, pages_col: str = "pages", out_col: str = "pdf"):
        self.pages_col = pages_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from documentai_ray.functions import minipng
        from documentai_ray.functions.pdfwrite import images_to_pdf

        pdfs: list[bytes] = []
        n_pages: list[int] = []
        for pages in batch.column(self.pages_col).to_pylist():
            imgs = [minipng.decode_gray(p) for p in pages]
            pdfs.append(images_to_pdf(imgs))
            n_pages.append(len(imgs))
        batch = batch.drop_columns([self.pages_col])
        out = batch.append_column(self.out_col,
                                  pa.array(pdfs, pa.large_binary()))
        out = out.append_column("n_pages", pa.array(n_pages, pa.int64()))
        return out.append_column(
            "pdf_bytes", pa.array([len(p) for p in pdfs], pa.int64()))


def base64_emit_batch(batch: pa.Table, *, payload_col: str = "payload",
                      out_col: str = "payload_b64") -> pa.Table:
    """K5: standard-alphabet base64 emission of a binary payload column
    (the reference returns page images base64-inline in its API
    responses; here it is a column transform, mirrored bit-exactly by
    DuckDB ``to_base64``)."""
    import base64

    vals = [base64.b64encode(p).decode("ascii")
            for p in batch.column(payload_col).to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.large_string()))


class VideoFrameSampleStage:
    """Actor-pool stage: sample every ``step``-th frame of an MPNG video
    payload and decode it for REAL (stdlib minipng) — skipped frames are
    never decoded, only hopped over in the container walk (the whole
    point of sample-before-decode at 100 TB). Explodes one row per
    sampled frame: ``(…, frame_idx, brightness)`` with brightness the
    exact integer pixel mean in ppm of 255ths — integer math so the
    construction oracle is bit-exact (same contract as image_quality).

    Wide binary rows ⇒ callers should pass a SMALL ``batch_size``; a real
    codec (ffmpeg) would slot in behind ``iter_frames`` unchanged."""

    def __init__(self, step: int = 2, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.step = step
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from documentai_ray.functions import minivideo

        ids: list[int] = []
        nf: list[int] = []
        fidx: list[int] = []
        bright: list[int] = []
        for did, payload in zip(batch.column(self.id_col).to_pylist(),
                                batch.column(self.payload_col).to_pylist()):
            n = minivideo.frame_count(payload)
            for i, frame in minivideo.iter_frames(payload, step=self.step):
                ids.append(did)
                nf.append(n)
                fidx.append(i)
                # exact: sum(pixels)·10⁶ // (npx·255) — no float division
                s = int(frame.astype(np.int64).sum())
                bright.append(s * 1_000_000 // (frame.size * 255))
        return pa.table({self.id_col: pa.array(ids, pa.int64()),
                         "n_frames": pa.array(nf, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int64()),
                         "brightness_ppm": pa.array(bright, pa.int64())})


def image_pipeline(ds, *, concurrency=(1, 4), batch_size: int = 32):
    """Binary-payload Dataset → features. Small batch_size on purpose:
    batch bytes ≈ batch_size × payload size must fit the worker heap."""
    return ds.map_batches(
        ImageFeatureStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"decode_stub": True},
    )
