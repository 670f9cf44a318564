"""End-to-end flagship pipeline + determinism tests (FIXTURES.md §4)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from documentai_ray.sources import pages
from tests.conftest import SF_SMOKE


def _doc_id(url: str) -> int:
    return int(re.search(r"/p/(\d+)", url).group(1))


@pytest.fixture(scope="module")
def flagship_df(ray_session):
    from documentai_ray.pipelines.flagship import flagship

    return flagship(sf_dir=SF_SMOKE).to_pandas().sort_values("url").reset_index(drop=True)


class TestFlagshipEndToEnd:
    def test_one_row_per_url_after_dedup(self, flagship_df):
        n_docs = pages.synth_pages_table(SF_SMOKE, with_dups=False).num_rows
        assert len(flagship_df) == n_docs
        assert flagship_df["url"].is_unique

    def test_byte_identical_text(self, flagship_df):
        import pyarrow.parquet as pq

        docs = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
        by_id = dict(zip(docs["doc_id"], docs["text"]))
        for _, row in flagship_df.iterrows():
            did = _doc_id(row["url"])
            assert row["text"] == pages.golden_text(did, by_id[did]), row["url"]

    def test_expected_categories_and_votes(self, flagship_df):
        saw_planted = False
        for _, row in flagship_df.iterrows():
            did = _doc_id(row["url"])
            assert row["category"] == pages.expected_category(did)
            # planted ambiguous POs (regex+tokenset defect to data_report)
            # fuse at 2/4; everything else is unanimous
            if pages.is_ambiguous_po(did) and not pages.is_malformed(did):
                assert row["votes"] == "2/4", row["url"]
                saw_planted = True
            else:
                assert row["votes"] == "4/4", row["url"]
        assert saw_planted

    def test_po_entities_and_rules(self, flagship_df):
        po = flagship_df[flagship_df["category"] == "purchase_order"]
        assert len(po) > 0
        for _, row in po.iterrows():
            want = pages.po_fields(_doc_id(row["url"]))
            for f, v in want.items():
                assert row[f] == v
            qty = 100 + _doc_id(row["url"]) % 400
            assert row["rules_passed"] == (8 if qty < 300 else 7)
            assert bool(row["overall_valid"]) == (qty < 300)

    def test_error_rows_survive_with_flags(self, flagship_df):
        errs = flagship_df[flagship_df["payload_kind"] == "error"]
        assert len(errs) > 0
        assert (errs["text"] == "").all()
        assert (errs["verdict"] == "re_scan").all()
        assert (errs["category"] == "unclassified").all()

    def test_quality_columns_present(self, flagship_df):
        assert {"n_chars", "rep_ratio", "confidence", "verdict", "lang_ok"} <= set(
            flagship_df.columns)
        nonblank = flagship_df[flagship_df["n_chars"] > 0]
        assert (nonblank["confidence"] > 0).all()


class TestDeterminism:
    """Same input → identical output regardless of run or parallelism
    (the rebuild's answer to the reference's test_consistency.py)."""

    def test_same_process_repeat(self, ray_session, flagship_df):
        from documentai_ray.pipelines.flagship import flagship

        again = flagship(sf_dir=SF_SMOKE).to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(flagship_df, again[flagship_df.columns])

    def test_entry_smoke(self, ray_session):
        import __ray_entry__ as e

        ds = e.entry()
        df = ds.to_pandas()
        assert len(df) > 0 and "url" in df.columns and "category" in df.columns


class TestMultimodal:
    def test_image_pipeline_plumbing(self, ray_session):
        from documentai_ray.stages.multimodal import image_pipeline

        rows = [{"item_id": i, "payload": bytes([i] * 100)} for i in range(20)]
        ds = ray_session.data.from_items(rows)
        out = image_pipeline(ds).to_pandas()
        assert len(out) == 20
        assert (out["decode_error"] == "").all()
        assert all(len(f) == 6 for f in out["img_features"])
        assert all(m["width"] == 32 for m in out["img_meta"])
        # determinism of the stub decode
        out2 = image_pipeline(ray_session.data.from_items(rows)).to_pandas()
        assert [list(f) for f in out["img_features"]] == [list(f) for f in out2["img_features"]]

    def test_audio_frames(self, ray_session):
        from documentai_ray.stages.multimodal import AudioFrameStage

        import pyarrow as pa

        stage = AudioFrameStage(frame_ms=500, bytes_per_frame=4)
        t = pa.table({"payload": pa.array([b"\x00\x04\x08\x0c\xff\xff\xff\xff"],
                                          pa.binary())})
        out = stage(t)
        frames = out.column("frames").to_pylist()[0]
        assert frames == [{"start_ms": 0, "energy": 6.0},
                          {"start_ms": 500, "energy": 255.0}]

    def test_real_decoder_is_marked_not_implemented(self):
        from documentai_ray.stages.multimodal import _decode_image_real

        with pytest.raises(NotImplementedError):
            _decode_image_real(b"px")


class TestCli:
    def test_cli_run_resumable(self, ray_session, tmp_path):
        import json
        import os

        from documentai_ray.cli import run as cli_run
        from documentai_ray.sources.pages import write_pages_corpus

        inp = os.path.join(str(tmp_path), "pages")
        out = os.path.join(str(tmp_path), "out")
        write_pages_corpus(inp, SF_SMOKE, shards=2)
        summary = cli_run(["run", "--input", inp, "--output", out,
                           "--buckets", "4"])
        assert summary["buckets_completed"] == 4 and summary["rows"] > 0
        assert os.path.exists(os.path.join(out, "_metrics.json"))
        with open(os.path.join(out, "_metrics.json")) as f:
            metrics = json.load(f)
        assert metrics["rows"] == summary["rows"]
        assert "purchase_order" in metrics["category_distribution"]


class TestPdfCorpusFlagship:
    def test_pdf_mode_end_to_end(self, ray_session):
        from documentai_ray.pipelines.flagship import flagship
        from documentai_ray.sources.pages import pages_dataset, is_malformed

        ds = pages_dataset(SF_SMOKE, with_dups=False, pdf_mode=True)
        df = flagship(ds).to_pandas()
        assert len(df) == 500
        ok = df[df["payload_kind"] == "pdf"]
        assert len(ok) == len(df) - df["payload_kind"].eq("error").sum()
        # pdf corpus wraps document text → every parsed row classifies as
        # data_report (vocab text), malformed rows as unclassified
        assert (ok["category"] == "data_report").all()
        errs = df[df["payload_kind"] == "error"]
        assert all(is_malformed(_doc_id(u)) for u in errs["url"])


class TestResize:
    def test_resize_nearest_exact(self):
        import numpy as np

        from documentai_ray.stages.multimodal import resize_nearest

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = resize_nearest(img, 2, 2)
        assert out.tolist() == [[0, 2], [8, 10]]
        up = resize_nearest(img, 8, 8)
        assert up.shape == (8, 8) and up[0, 0] == 0 and up[-1, -1] == 15

    def test_resize_stage(self, ray_session):
        from documentai_ray.stages.multimodal import ImageResizeStage

        import pyarrow as pa

        stage = ImageResizeStage(width=8, height=8)
        t = pa.table({"payload": pa.array([b"img-one", b"img-two"], pa.binary())})
        out = stage(t)
        assert out.column("width").to_pylist() == [8, 8]
        assert all(len(p) == 8 * 8 * 3 for p in out.column("payload").to_pylist())


class TestCliSubcommands:
    def test_extract_and_classify_subcommands(self, ray_session, tmp_path):
        import os

        from documentai_ray.cli import run as cli_run
        from documentai_ray.sources.pages import write_pages_corpus

        inp = os.path.join(str(tmp_path), "pages")
        write_pages_corpus(inp, SF_SMOKE, shards=2)
        out1 = os.path.join(str(tmp_path), "ex")
        s1 = cli_run(["extract", "--input", inp, "--output", out1])
        assert s1["rows"] > 0
        out2 = os.path.join(str(tmp_path), "cl")
        s2 = cli_run(["classify", "--input", inp, "--output", out2])
        assert s2["rows"] == s1["rows"]
        import ray.data

        schema = ray.data.read_parquet(out2).schema()
        assert {"category", "votes", "verdict"} <= set(schema.names)


class TestMiniwav:
    def test_roundtrip_and_rms_frames(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from documentai_ray.functions.miniwav import decode_pcm16, encode_pcm16, is_wav
        from documentai_ray.stages.multimodal import AudioFrameStage

        sig = np.where((np.arange(2048) // 8) % 2 == 0, 500, -500).astype(np.int16)
        wav = encode_pcm16(sig, sample_rate=8000)
        assert is_wav(wav) and not is_wav(b"nope")
        back, sr = decode_pcm16(wav)
        assert sr == 8000 and np.array_equal(back, sig)
        st = AudioFrameStage(frame_samples=1024)
        out = st(pa.table({"payload": pa.array([wav], pa.large_binary())}))
        frames = out.column("frames").to_pylist()[0]
        assert len(frames) == 2
        assert all(f["energy"] == 500.0 for f in frames)  # |square| RMS exact
        assert frames[1]["start_ms"] == 1024 * 1000 // 8000

    def test_non_wav_falls_back_to_stub(self):
        import pyarrow as pa

        from documentai_ray.stages.multimodal import AudioFrameStage

        st = AudioFrameStage(bytes_per_frame=4)
        out = st(pa.table({"payload": pa.array([b"\x01\x02\x03\x04\x05"],
                                               pa.large_binary())}))
        assert len(out.column("frames").to_pylist()[0]) == 2
