"""Multiplier-bootstrap CI and leave-one-source-out jackknife."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestBootstrapCi:
    def _write_lineitem(self, tmp_path, rows):
        df = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber",
                                         "l_quantity"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))

    def test_constant_data_collapses_interval(self, ray_session,
                                              tmp_path):
        """Every row v=5: any replicate with sw>0 has mean exactly
        5e6, so ci_lo == mean == ci_hi — and the assertion doubles as
        a check that no replicate degenerated to sw=0 (which would
        pull ci_lo to the 0 guard)."""
        import __ray_entry__ as entrymod

        self._write_lineitem(
            tmp_path, [(k, 1, 5.0) for k in range(1, 21)])
        out = entrymod._q_bootstrap_ci(str(tmp_path)).iloc[0]
        assert (out["n"], out["n_reps"]) == (20, 32)
        assert out["mean_ppm"] == 5_000_000
        assert out["ci_lo_ppm"] == 5_000_000
        assert out["ci_hi_ppm"] == 5_000_000

    def test_mixed_data_brackets_mean(self, ray_session, tmp_path):
        """Half 0s and half 10s: replicate means genuinely spread, the
        rank-picked interval strictly brackets the point estimate."""
        import __ray_entry__ as entrymod

        rows = [(k, 1, 0.0) for k in range(1, 31)]
        rows += [(k, 2, 10.0) for k in range(1, 31)]
        self._write_lineitem(tmp_path, rows)
        out = entrymod._q_bootstrap_ci(str(tmp_path)).iloc[0]
        assert out["mean_ppm"] == 5_000_000
        assert out["ci_lo_ppm"] < 5_000_000 < out["ci_hi_ppm"]
        assert out["ci_lo_ppm"] > 0

    def test_partitioning_invariance(self, ray_session, tmp_path):
        """Weights hash (row id, replicate), never block boundaries:
        the same rows through 1 block and 7 blocks give identical
        intervals."""
        import ray.data

        import __ray_entry__ as entrymod

        rows = [(k, 1, float(k % 13)) for k in range(1, 101)]
        self._write_lineitem(tmp_path, rows)
        out1 = entrymod._q_bootstrap_ci(str(tmp_path))
        # re-run with a different layout of the same parquet
        df = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber",
                                         "l_quantity"])
        os.remove(os.path.join(tmp_path, "lineitem.parquet"))
        os.mkdir(os.path.join(tmp_path, "lineitem.parquet"))
        for i in range(7):
            part = df.iloc[i::7]
            pq.write_table(
                pa.Table.from_pandas(part, preserve_index=False),
                os.path.join(tmp_path, "lineitem.parquet",
                             f"part{i}.parquet"))
        out7 = entrymod._q_bootstrap_ci(str(tmp_path))
        assert out1.to_dict("records") == out7.to_dict("records")


class TestJackknifeSources:
    def test_hand_influences(self, ray_session, tmp_path):
        """A: 4/4 en, B: 0/4, C: 1/2 -> full 500000; without A
        1/6 = 166666 (influence -333334), without B 5/6 = 833333
        (+333333), without C 4/8 = 500000 (0)."""
        import __ray_entry__ as entrymod

        rows = ([("A", "en")] * 4 + [("B", "de")] * 4
                + [("C", "en"), ("C", "fr")])
        df = pd.DataFrame(rows, columns=["source", "lang"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = (entrymod._q_jackknife_sources(str(tmp_path))
               .set_index("source"))
        assert set(out["share_full_ppm"]) == {500_000}
        assert (out.loc["A", "share_wo_ppm"],
                out.loc["A", "influence_ppm"]) == (166_666, -333_334)
        assert (out.loc["B", "share_wo_ppm"],
                out.loc["B", "influence_ppm"]) == (833_333, 333_333)
        assert (out.loc["C", "share_wo_ppm"],
                out.loc["C", "influence_ppm"]) == (500_000, 0)
