"""Dyadic-decay leaderboard, degree assortativity, nDCG@5 eval."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_decayed_leaderboard_halving_and_ties(ray_session):
    import ray.data

    from documentai_ray.stages.windows import decayed_sum_topk

    base = pd.Timestamp("2024-02-01 12:00:00")  # corpus max
    rows = []
    for u, ts, n in [("uA", base, 3),
                     ("uD", base, 3),
                     ("uB", base - pd.Timedelta(days=1), 8),
                     ("uC", base - pd.Timedelta(days=25), 2)]:
        rows += [(u, ts)] * n
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = decayed_sum_topk(ray.data.from_pandas(ev), key_col="user_id",
                           k=10)
    # uB: 8·(1e6>>1)=4e6 beats uA/uD: 3·1e6; tie → id asc; uC: 1e6>>25=0
    assert list(out["user_id"]) == ["uB", "uA", "uD", "uC"]
    assert list(out["score_ppm"]) == [4_000_000, 3_000_000, 3_000_000, 0]
    assert list(out["rank"]) == [1, 2, 3, 4]


def test_degree_assortativity_matches_bruteforce(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    n = 6
    pq.write_table(pa.table({"doc_id": list(range(n)),
                             "text": ["x"] * n}),
                   os.path.join(tmp_path, "documents.parquet"))
    out = entrymod._q_degree_assortativity(str(tmp_path))
    assert len(out) == 1
    # rebuild the edge list + in-degrees and brute-force every pair
    edges = []
    for d in range(n):
        edges.append((d, (d * 7 + 1) % n))
        if d % 3 >= 1:
            edges.append((d, (d * 13 + 2) % n))
        if d % 3 == 2:
            edges.append((d, (d * 31 + 3) % n))
    indeg = {v: 0 for v in range(n)}
    for _, t in edges:
        indeg[t] += 1
    pts = [(indeg[s], indeg[t]) for s, t in edges]
    m = len(pts)
    assert int(out["n"].iloc[0]) == m == 12
    conc = disc = 0
    for i in range(m):
        for j in range(i + 1, m):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    assert int(out["concordant"].iloc[0]) == conc
    assert int(out["discordant"].iloc[0]) == disc
    pairs = m * (m - 1) // 2
    num = (conc - disc) * 1_000_000
    expect = abs(num) // pairs * (1 if num >= 0 else -1)
    assert int(out["tau_a_ppm"].iloc[0]) == expect


def test_ndcg_eval_depth_credit(ray_session, tmp_path):
    import __ray_entry__ as entrymod
    from documentai_ray.stages.indexing import bm25_topk
    import ray.data

    # two AND-relevant docs for q_rare: short d0 outranks padded d4
    # (length normalization); nDCG credits BOTH, discounted by depth.
    docs = pa.table({
        "doc_id": [0, 1, 2, 4],
        "text": ["dup merge", "merge merge", "dup dup x",
                 "dup merge x x x x x x"]})
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    out = (entrymod._q_ndcg_eval(str(tmp_path))
           .set_index("query_id"))
    top = bm25_topk(ray.data.from_arrow(docs),
                    queries={"q_rare": ["dup", "merge"]}, k=5)
    ranks = dict(zip(top["doc_id"], top["rank"]))
    assert ranks[0] < ranks[4], "shorter both-term doc must rank higher"
    dcg = 1_000_000 // (1 + ranks[0]) + 1_000_000 // (1 + ranks[4])
    idcg = 500_000 + 333_333
    assert out.loc["q_rare", "n_rel_total"] == 2
    assert out.loc["q_rare", "dcg_ppm"] == dcg
    assert out.loc["q_rare", "idcg_ppm"] == idcg
    assert out.loc["q_rare", "ndcg_ppm"] == 1_000_000 * dcg // idcg
    # no relevant docs → all-zero row, not a missing row
    assert out.loc["q_exec", "ndcg_ppm"] == 0
    assert out.loc["q_exec", "idcg_ppm"] == 0
