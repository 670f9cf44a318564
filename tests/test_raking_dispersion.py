"""IPF two-margin raking and Gries DP term dispersion."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestIpfRaking:
    def test_hand_two_step_weights(self, ray_session, tmp_path):
        """Doc coins sample {0,2,4,5,7}. Row step: w1_A = 5e6//3 =
        1666666, w1_B = 2500000. Col step against T_en = 5833332,
        T_de = 4166666 pins the four cell weights, and the weighted
        lang margins land at 4999999 each — one ppm of flooring
        residue off the exact 5e6 target."""
        import __ray_entry__ as entrymod

        docs = [(0, "A", "en"), (1, "A", "en"), (2, "A", "de"),
                (3, "B", "en"), (4, "B", "en"), (5, "B", "de"),
                (6, "B", "de"), (7, "A", "en"), (8, "A", "de"),
                (9, "B", "de")]
        df = pd.DataFrame(docs, columns=["doc_id", "source", "lang"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = entrymod._q_ipf_raking(str(tmp_path))
        got = {(r["source"], r["lang"]): (r["n_samp"], r["w2_ppm"])
               for _, r in out.iterrows()}
        assert got == {("A", "en"): (2, 1_428_571),
                       ("A", "de"): (1, 1_999_999),
                       ("B", "en"): (1, 2_142_857),
                       ("B", "de"): (1, 3_000_000)}
        en = 2 * 1_428_571 + 1 * 2_142_857
        de = 1 * 1_999_999 + 1 * 3_000_000
        assert en == 4_999_999 and de == 4_999_999


class TestTermDispersion:
    def _write(self, tmp_path, docs):
        df = pd.DataFrame(docs, columns=["source", "text"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))

    def test_hand_dp_values(self, ray_session, tmp_path):
        """A='x x y' (3 tokens), B='y y y x' (4): DP(x) =
        1e7//42 = 238095, DP(y) = 1e7//56 = 178571 — both terms
        lean toward one source, y less than x relative to its
        volume."""
        import __ray_entry__ as entrymod

        self._write(tmp_path, [("A", "x x y"), ("B", "y y y x")])
        out = (entrymod._q_term_dispersion(str(tmp_path))
               .set_index("token"))
        assert list(out.index) == ["y", "x"]  # count desc order
        assert (out.loc["x", "n_total"], out.loc["x", "dp_ppm"]) \
            == (3, 238_095)
        assert (out.loc["y", "n_total"], out.loc["y", "dp_ppm"]) \
            == (4, 178_571)

    def test_proportional_term_scores_zero(self, ray_session,
                                           tmp_path):
        """A term spread exactly like the sources' token volumes has
        DP exactly 0."""
        import __ray_entry__ as entrymod

        self._write(tmp_path, [("A", "z z z"), ("B", "z z z z")])
        out = entrymod._q_term_dispersion(str(tmp_path)).iloc[0]
        assert (out["token"], out["n_total"], out["dp_ppm"]) \
            == ("z", 7, 0)
