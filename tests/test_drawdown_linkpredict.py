"""Max drawdown path statistic and common-neighbor link prediction."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _lineitem(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["l_shipdate", "l_extendedprice",
                                     "l_returnflag"])
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))


class TestMaxDrawdown:
    def test_hand_path(self, ray_session, tmp_path):
        """Net flows +100,−30,−20,+60,−80 → cum 100/70/50/110/30,
        high-water 100/100/100/110/110, drawdowns 0/30/50/0/80:
        max 80 at day 5 under the 110 peak; underwater runs are
        days 2-3 (len 2) and day 5 (len 1)."""
        rows = [("2024-01-01", 1.00, "N"), ("2024-01-02", 0.30, "R"),
                ("2024-01-03", 0.20, "R"), ("2024-01-04", 0.60, "N"),
                ("2024-01-05", 0.80, "R")]
        _lineitem(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_max_drawdown(str(tmp_path)).iloc[0]
        assert (out["n_days"], out["final_cents"]) == (5, 30)
        assert out["max_drawdown_cents"] == 80
        assert out["trough_day"] == pd.Timestamp("2024-01-05")
        assert out["peak_cents"] == 110
        assert out["underwater_max_run"] == 2

    def test_tie_takes_earliest_trough(self, ray_session, tmp_path):
        """+100 then −50 twice-observed at the same depth (a flat
        bottom): dd = 50 on days 2 and 3, trough reads day 2."""
        rows = [("2024-01-01", 1.00, "N"),
                ("2024-01-02", 0.50, "R"),
                ("2024-01-03", 0.25, "R"), ("2024-01-03", 0.25, "N")]
        _lineitem(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_max_drawdown(str(tmp_path)).iloc[0]
        assert out["max_drawdown_cents"] == 50
        assert out["trough_day"] == pd.Timestamp("2024-01-02")

    def test_zero_baseline_high_water(self, ray_session, tmp_path):
        """A book that opens NEGATIVE draws down from the flat-zero
        baseline (rm clamps at 0) — the documented convention."""
        rows = [("2024-01-01", 0.40, "R"), ("2024-01-02", 0.10, "N")]
        _lineitem(tmp_path, rows)
        import __ray_entry__ as entrymod

        out = entrymod._q_max_drawdown(str(tmp_path)).iloc[0]
        assert out["max_drawdown_cents"] == 40
        assert out["peak_cents"] == 0
        assert out["trough_day"] == pd.Timestamp("2024-01-01")


class TestLinkPredict:
    def test_seven_node_hand_graph(self, ray_session, tmp_path):
        """n = 7: every jump edge 7i+1 ≡ 1 lands on node 1 (the hub
        case — node 1's wedge basket is all six other nodes), and
        node 1's own jump is a self-loop that must drop.  The five
        non-edges rank (0,4,4), (2,5,4), (0,3,3), (2,6,3), (3,6,3) —
        hand-counted from the neighbor sets."""
        pq.write_table(pa.table({"doc_id": list(range(7))}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_link_predict(str(tmp_path)).to_pandas()
        got = list(map(tuple, out[["a", "b", "cn"]].to_numpy()))
        assert got == [(0, 4, 4), (2, 5, 4), (0, 3, 3),
                       (2, 6, 3), (3, 6, 3)]

    def test_five_node_wrap_graph_is_complete(self, ray_session,
                                              tmp_path):
        """n = 5: the wrapped band edges alone close every pair
        (4 to (4+2)%5 = 1 etc.) - no open wedges, empty result."""
        pq.write_table(pa.table({"doc_id": list(range(5))}),
                       os.path.join(tmp_path, "documents.parquet"))
        import __ray_entry__ as entrymod

        out = entrymod._q_link_predict(str(tmp_path)).to_pandas()
        assert len(out) == 0

    def test_kernel_excludes_adjacent(self, ray_session):
        """Path graph 0-1-2-3: candidates are exactly the distance-2
        pairs (0,2),(1,3) with cn 1 each — (0,1) etc. are edges and
        the wedge (0,2) through 1 must not leak them back."""
        import ray.data

        from documentai_ray.stages.graph import common_neighbor_predict

        edges = ray.data.from_items([
            {"src": 0, "dst": 1}, {"src": 1, "dst": 2},
            {"src": 2, "dst": 3}])
        out = common_neighbor_predict(edges, top_k=10,
                                      num_partitions=4).to_pandas()
        got = sorted(map(tuple, out[["a", "b", "cn"]].to_numpy()))
        assert got == [(0, 2, 1), (1, 3, 1)]
