"""Corpus-curation operator tests (decontamination, sampling, repetition,
redaction)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from documentai_ray.stages import curation


class TestDecontamination:
    def test_overlap_flagging(self, ray_session):
        import ray.data

        bench = ["w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14"]
        ngrams = curation.build_ngram_set(bench, n=13)
        assert ngrams.size == 2  # 14 tokens → two 13-grams
        rows = [
            {"doc_id": 0, "text": bench[0] + " trailing words here"},  # hit
            {"doc_id": 1, "text": "totally different " * 10},           # miss
            {"doc_id": 2, "text": "short text"},                        # <13 toks
        ]
        ds = ray.data.from_items(rows)
        out = curation.decontaminate(ds, ngrams, n=13).to_pandas()
        got = dict(zip(out["doc_id"], out["contaminated"]))
        assert got == {0: True, 1: False, 2: False}

    def test_empty_benchmark(self):
        assert curation.build_ngram_set([], n=13).size == 0
        assert curation.build_ngram_set(["one two"], n=13).size == 0


class TestSampling:
    def test_deterministic_and_rate_shaped(self, ray_session):
        import ray.data

        rows = [{"doc_id": i, "source": "keep" if i % 2 else "drop"}
                for i in range(2000)]
        ds = ray.data.from_items(rows)
        out = curation.sample_by_source(
            ds, {"keep": 1.0, "drop": 0.0}).to_pandas()
        assert (out["source"] == "keep").all()
        assert len(out) == 1000
        # half-rate keeps roughly half (deterministic, not random)
        out2 = curation.sample_by_source(
            ray.data.from_items(rows), {"keep": 0.5, "drop": 0.5}).to_pandas()
        assert 800 < len(out2) < 1200
        out3 = curation.sample_by_source(
            ray.data.from_items(rows), {"keep": 0.5, "drop": 0.5}).to_pandas()
        assert sorted(out2["doc_id"]) == sorted(out3["doc_id"])  # stable


class TestRepetition:
    def test_stats(self):
        dup, top2 = curation.repetition_stats("a b a b a b")
        # 6 tokens, 2 distinct → dup 4/6; 5 bigrams, 'a b' ×3 → 3/5
        assert abs(dup - (1 - 2 / 6)) < 1e-6
        assert abs(top2 - 3 / 5) < 1e-6
        assert curation.repetition_stats("") == (0.0, 0.0)
        assert curation.repetition_stats("solo") == (0.0, 0.0)

    def test_batch_keep_flag(self):
        batch = pa.table({"text": pa.array(
            ["a b a b a b", " ".join(f"w{i}" for i in range(100))],
            pa.large_string())})
        out = curation.repetition_batch(batch, max_top2_frac=0.03)
        assert out.column("rep_keep").to_pylist() == [False, True]


class TestRedaction:
    def test_patterns(self):
        t = "PO DATED 13.01.2024 TOTAL USD 57,500.00 END"
        assert curation.redact_text(t) == "PO DATED <DATE> TOTAL <AMT> END"
        assert curation.redact_text("no patterns") == "no patterns"
