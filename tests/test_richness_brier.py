"""Chao1/Good-Turing richness and Murphy Brier decomposition."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestSpeciesRichness:
    def test_hand_counts(self, ray_session, tmp_path):
        """Corpus 'a a b c' + 'c d': freqs a=2, b=1, c=2, d=1 →
        S=4, N=6, f1=2, f2=2: chao1 = 4 + 2·1//6 = 4,
        coverage = 1e6·4//6 = 666666."""
        pq.write_table(pa.table({"text": ["a a b c", "c d"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_species_richness(str(tmp_path)).iloc[0]
        assert (out["n_tokens"], out["vocab"]) == (6, 4)
        assert (out["f1"], out["f2"]) == (2, 2)
        assert out["chao1"] == 4
        assert out["coverage_ppm"] == 666_666

    def test_singleton_heavy_extrapolates(self, ray_session, tmp_path):
        """Five singletons, no doubletons: the bias-corrected Chao1
        adds f1(f1−1)/2 = 10 unseen species (f2 = 0 is exactly where
        the uncorrected f1²/2f2 blows up); coverage reads 0 — every
        token is new, Turing says the next one will be too."""
        pq.write_table(pa.table({"text": ["a b c d e"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_species_richness(str(tmp_path)).iloc[0]
        assert out["vocab"] == 5
        assert out["chao1"] == 15
        assert out["coverage_ppm"] == 0

    def test_whitespace_and_empty_text(self, ray_session, tmp_path):
        """Tabs/newlines/multi-space split like \\s+, empty and None
        texts contribute nothing."""
        pq.write_table(pa.table({"text": ["a\tb\n b", "", None]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_species_richness(str(tmp_path)).iloc[0]
        assert (out["n_tokens"], out["vocab"]) == (3, 2)
        assert (out["f1"], out["f2"]) == (1, 1)


class TestBrierDecomp:
    def test_hand_identity_exact(self, ray_session, tmp_path):
        """Two p=0 users (y=0,0) + two p=1e6 users (y=1,0): all four
        Murphy terms are exact (no floor noise), Brier 2.5e11 =
        REL 1.25e11 − RES 6.25e10 + UNC 1.875e11, gap 0."""
        rows = []
        ts = pd.Timestamp("2024-01-01")
        # users 1,2: one non-converting event each → p = 0
        rows.append((1, ts, "view", 0.0))
        rows.append((2, ts, "purchase", 100.0))
        # users 3,4: 90 events → p = 1e6; user 3 converts
        for i in range(90):
            rows.append((3, ts, "purchase" if i == 0 else "view",
                         200.0 if i == 0 else 0.0))
            rows.append((4, ts, "view", 0.0))
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_brier_decomp(str(tmp_path)).iloc[0]
        assert (out["n_users"], out["n_levels"]) == (4, 2)
        assert out["brier_ppm2"] == 250_000_000_000
        assert out["rel_ppm2"] == 125_000_000_000
        assert out["res_ppm2"] == 62_500_000_000
        assert out["unc_ppm2"] == 187_500_000_000
        assert out["gap_ppm2"] == 0

    def test_perfect_forecaster(self, ray_session, tmp_path):
        """p=1e6 user converts, p=0 user doesn't: Brier 0, REL 0,
        and RES = UNC (resolution captures all the uncertainty)."""
        rows = [(1, pd.Timestamp("2024-01-01"), "view", 0.0)]
        for i in range(90):
            rows.append((2, pd.Timestamp("2024-01-01"),
                         "purchase" if i == 0 else "view",
                         200.0 if i == 0 else 0.0))
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                         "value"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "events.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_brier_decomp(str(tmp_path)).iloc[0]
        assert out["brier_ppm2"] == 0
        assert out["rel_ppm2"] == 0
        assert out["res_ppm2"] == out["unc_ppm2"] == 250_000_000_000
        assert out["gap_ppm2"] == 0
