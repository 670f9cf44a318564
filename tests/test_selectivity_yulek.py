"""AVI selectivity audit and Yule's K / Simpson repeat rate."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestSelectivityAudit:
    def test_planted_dependence(self, ray_session, tmp_path):
        """R ⟺ F exactly (returns only on finished lines), quantity
        split with them: every pair/triple is actually 500000 ppm
        but AVI multiplies to 250000 (pairs) and 125000 (triple) —
        the 2×/4× underestimate a real planner would make."""
        df = pd.DataFrame({
            "l_returnflag": ["R", "R", "N", "N"],
            "l_quantity": [30.0, 35.0, 1.0, 2.0],
            "l_linestatus": ["F", "F", "O", "O"]})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_selectivity_audit(str(tmp_path)) \
            .set_index("pred")
        assert (out.loc["return&lsF", "actual_ppm"],
                out.loc["return&lsF", "avi_ppm"]) == (500_000, 250_000)
        assert out.loc["return&lsF", "diff_ppm"] == 250_000
        assert out.loc["return&bigqty&lsF", "avi_ppm"] == 125_000
        assert out.loc["return&bigqty&lsF", "diff_ppm"] == 375_000

    def test_independent_reads_zero(self, ray_session, tmp_path):
        """A perfectly balanced 2×2×2 cross: every actual equals its
        AVI product, diff 0 on all four rows."""
        rows = []
        for r in ["R", "N"]:
            for q in [30.0, 1.0]:
                for f in ["F", "O"]:
                    rows.append((r, q, f))
        df = pd.DataFrame(rows, columns=["l_returnflag", "l_quantity",
                                         "l_linestatus"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_selectivity_audit(str(tmp_path))
        assert (out["diff_ppm"] == 0).all()


class TestYuleK:
    def test_hand_repeat(self, ray_session, tmp_path):
        """'a a b': N = 3, S2 = 5 → K = 10⁴·2/9 (milli 2222222),
        Simpson = 2/6 (two draws without replacement coincide with
        probability 1/3)."""
        pq.write_table(pa.table({"text": ["a a b"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_yule_k(str(tmp_path)).iloc[0]
        assert (out["n_tokens"], out["vocab"], out["s2"]) == (3, 2, 5)
        assert out["yule_k_milli"] == 2_222_222
        assert out["simpson_ppm"] == 333_333

    def test_all_distinct_reads_zero(self, ray_session, tmp_path):
        """No repeats: S2 = N → both constants 0 (maximum
        diversity)."""
        pq.write_table(pa.table({"text": ["a b c d"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_yule_k(str(tmp_path)).iloc[0]
        assert out["yule_k_milli"] == 0
        assert out["simpson_ppm"] == 0
