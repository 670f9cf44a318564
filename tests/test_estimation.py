"""Sample-estimation family: post-stratification, mark-recapture,
German-tank."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

M1, M2, MOD = 2654435761, 2246822519, 1 << 32


def _coin(ids, mult, th):
    h = (np.asarray(ids, dtype=np.uint64) * np.uint64(mult)) \
        % np.uint64(MOD)
    return h < np.uint64(th)


def test_post_stratify_weights_and_unsampled_raise(ray_session,
                                                   tmp_path):
    import __ray_entry__ as entrymod

    ids = np.arange(1, 101)
    samp = _coin(ids, M1, MOD // 10)
    df = pd.DataFrame({"c_custkey": ids, "c_mktsegment": "A"})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "customer.parquet"))
    out = entrymod._q_post_stratify(str(tmp_path)).iloc[0]
    n_s = int(samp.sum())
    assert n_s > 0
    assert out["n_pop"] == 100 and out["n_samp"] == n_s
    assert out["weight_ppm"] == 1_000_000 * 100 // n_s

    # a segment whose only customer misses the coin must raise loudly
    unsampled = int(ids[~samp][0])
    df2 = pd.concat([df, pd.DataFrame({"c_custkey": [unsampled + 1000],
                                       "c_mktsegment": ["Z"]})])
    # ensure the planted id is genuinely unsampled
    while _coin([unsampled + 1000], M1, MOD // 10)[0]:
        unsampled += 1
        df2.iloc[-1, 0] = unsampled + 1000
    pq.write_table(pa.Table.from_pandas(df2, preserve_index=False),
                   os.path.join(tmp_path, "customer.parquet"))
    with pytest.raises(ValueError, match="unsampled"):
        entrymod._q_post_stratify(str(tmp_path))


def test_lincoln_petersen_formula(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    ids = np.arange(1, 401)
    a = _coin(ids, M1, MOD // 5)
    b = _coin(ids, M2, MOD // 5)
    pq.write_table(pa.table({"c_custkey": ids}),
                   os.path.join(tmp_path, "customer.parquet"))
    out = entrymod._q_lincoln_petersen(str(tmp_path)).iloc[0]
    n1, n2, m = int(a.sum()), int(b.sum()), int((a & b).sum())
    assert m > 0
    assert (out["n1"], out["n2"], out["m_both"]) == (n1, n2, m)
    assert out["n_est"] == n1 * n2 // m
    assert out["err_ppm"] == 1_000_000 * abs(n1 * n2 // m - 400) // 400


def test_german_tank_formula(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    ids = np.arange(1, 101)
    samp = _coin(ids, M1, MOD // 10)
    pq.write_table(pa.table({"o_orderkey": ids}),
                   os.path.join(tmp_path, "orders.parquet"))
    out = entrymod._q_german_tank(str(tmp_path)).iloc[0]
    k, mx = int(samp.sum()), int(ids[samp].max())
    assert out["k"] == k and out["sample_max"] == mx
    assert out["n_est"] == mx + mx // k - 1
    assert out["max_true"] == 100
