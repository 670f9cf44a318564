"""Content-defined chunking and RAKE keyphrase extraction."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


class TestCdcChunks:
    def test_hand_boundaries_and_dedup(self, ray_session, tmp_path):
        """'t4' is a boundary token (md5-LE64 ≡ 0 mod 16).  Doc 1
        'a b t4 c d' cuts into ('a b t4', 'c d'); doc 2 'x t4 c d'
        into ('x t4', 'c d') — the SHARED trailing chunk 'c d' is
        exactly what content-defined boundaries preserve across the
        differing prefixes (fixed blocking would shift it).  4 total
        chunks, 3 distinct; chars 6+3+4+3 = 16 total, 13 distinct →
        dedup 3/16 = 187500 ppm."""
        pq.write_table(pa.table({"text": ["a b t4 c d", "x t4 c d"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_cdc_chunks(str(tmp_path)).iloc[0]
        assert (out["n_docs"], out["total_chunks"],
                out["distinct_chunks"]) == (2, 4, 3)
        assert (out["total_chars"], out["distinct_chars"]) == (16, 13)
        assert out["dedup_ratio_ppm"] == 187_500

    def test_no_boundary_single_chunk(self, ray_session, tmp_path):
        """No boundary token: each doc is one chunk; identical docs
        dedup whole."""
        pq.write_table(pa.table({"text": ["a b c", "a b c", ""]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_cdc_chunks(str(tmp_path)).iloc[0]
        assert (out["n_docs"], out["total_chunks"],
                out["distinct_chunks"]) == (3, 2, 1)
        assert out["dedup_ratio_ppm"] == 500_000


class TestRake:
    def test_hand_scores(self, ray_session, tmp_path):
        """'deep learning' twice and once broken by the stopword
        'of': freq(deep)=3, deg(deep)=2+2+1=5 (two bigram runs, one
        singleton), freq(learning)=3 deg=5; score(deep) =
        1666666 ppm; the bigram scores 3333332 and outranks both
        singletons — RAKE's long-phrase preference in miniature."""
        pq.write_table(pa.table({"text": [
            "deep learning", "deep learning", "deep of learning"]}),
            os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_rake_keyphrases(str(tmp_path))
        top = out.iloc[0]
        assert top["phrase"] == "deep learning"
        assert top["n"] == 2
        assert top["score_ppm"] == 2 * (1_000_000 * 5 // 3)
        singles = out[out["phrase"] == "deep"]
        assert singles["score_ppm"].iloc[0] == 1_000_000 * 5 // 3
        assert singles["n"].iloc[0] == 1

    def test_stopword_only_doc_empty(self, ray_session, tmp_path):
        """A doc of pure stopwords yields no phrases; the other doc's
        phrase stands alone."""
        pq.write_table(pa.table({"text": ["the of a to", "alpha beta"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_rake_keyphrases(str(tmp_path))
        assert len(out) == 1
        assert out["phrase"].iloc[0] == "alpha beta"
        # both words: freq 1, deg 2 -> 2e6 each -> phrase 4e6
        assert out["score_ppm"].iloc[0] == 4_000_000
