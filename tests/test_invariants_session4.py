"""Engine invariants for this session's ops over seeded random corpora.

Each property is one the OPERATOR must satisfy on any input — not a
value pin: qini's running sum and terminal identities, the conformal
rank clamp, bootstrap interval bounds, MASE sharing backtest_mae's
pair semantics verbatim, Kitagawa's terms summing to the true share
change within the documented flooring residue, elasticity sign
self-consistency, chain-ladder's non-negative IBNR with mature
cohorts exactly closed, calibration's ECE reconstruction, and IPF's
one-sided lang-margin shortfall bound.
"""

from __future__ import annotations

import os
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_corpus(tmp_path, seed: int):
    rng = np.random.RandomState(seed)
    n_users, n_ev = 40, 1200
    base = pd.Timestamp("2024-03-01")
    uid = rng.randint(0, n_users, n_ev)
    ts = base + pd.to_timedelta(rng.randint(0, 30 * 24 * 3600, n_ev),
                                unit="s")
    et = rng.choice(["view", "click", "purchase"], n_ev,
                    p=[0.5, 0.3, 0.2])
    val = np.round(rng.uniform(10, 300, n_ev), 2)
    df = pd.DataFrame({"user_id": uid, "ts": ts, "event_type": et,
                       "value": val,
                       "event_id": np.arange(n_ev, dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    return df


SEEDS = [11, 23]


@pytest.mark.parametrize("seed", SEEDS)
class TestEventOpInvariants:
    @pytest.fixture()
    def corpus(self, tmp_path, seed):
        return _events_corpus(tmp_path, seed), str(tmp_path)

    def test_qini_identities(self, ray_session, corpus):
        import __ray_entry__ as entrymod

        _, d = corpus
        out = entrymod._q_qini_auuc(d)
        assert list(out["auuc_cum"]) == list(out["qini"].cumsum())
        assert (out[["cum_n_treat", "cum_n_ctrl"]].diff().iloc[1:]
                >= 0).all().all()
        last = out.iloc[-1]
        assert last["rand_base"] == last["qini"]
        assert last["gain"] == 0

    def test_conformal_rank_clamp_and_bounds(self, ray_session,
                                             corpus):
        import __ray_entry__ as entrymod

        _, d = corpus
        out = entrymod._q_conformal_interval(d).to_pandas()
        for _, r in out.iterrows():
            assert r["k"] == min((9 * r["n_cal"] + 18) // 10,
                                 r["n_cal"])
            assert 0 <= r["n_covered"] <= r["n_test"]
            assert r["coverage_ppm"] \
                == 1_000_000 * r["n_covered"] // r["n_test"]

    def test_mase_shares_backtest_pair_semantics(self, ray_session,
                                                 corpus):
        import __ray_entry__ as entrymod

        _, d = corpus
        mase = (entrymod._q_mase_eval(d).to_pandas()
                .set_index("event_type"))
        bt = (entrymod._q_backtest_mae(d).to_pandas()
              .set_index("event_type"))
        for et in bt.index:
            assert mase.loc[et, "n_pairs_season"] \
                == bt.loc[et, "n_pairs"]
            assert mase.loc[et, "sae_season"] \
                == bt.loc[et, "sum_abs_err"]

    def test_kitagawa_residue_bound(self, ray_session, corpus):
        import __ray_entry__ as entrymod

        df, d = corpus
        out = entrymod._q_kitagawa_decomp(d)
        us = df["ts"].astype("datetime64[us]").astype("int64")
        dd = us // 86_400_000_000
        mid = (int(dd.min()) + int(dd.max())) // 2
        per = dd >= mid
        p = (df["event_type"] == "purchase")
        d0 = Fraction(int(p[~per].sum()), int((~per).sum()))
        d1 = Fraction(int(p[per].sum()), int(per.sum()))
        true_delta = (d1 - d0) * 1_000_000
        got = int((out["mix_ppm"] + out["rate_ppm"]
                   + out["inter_ppm"]).sum())
        # each of the 3 terms per segment floors once -> residue
        # bounded by 3 ppm per segment (+1 slack for the rational)
        assert abs(got - true_delta) <= 3 * len(out) + 1

    def test_emd_range(self, ray_session, corpus):
        import __ray_entry__ as entrymod

        _, d = corpus
        out = entrymod._q_emd_hourly(d)
        assert (out["emd_milli"] >= 0).all()
        assert (out["emd_milli"] <= 23_000).all()

    def test_calibration_ece_reconstruction(self, ray_session,
                                            corpus):
        import __ray_entry__ as entrymod

        _, d = corpus
        out = entrymod._q_calibration_bins(d)
        n = int(out["n"].sum())
        ece = int((out["n"] * out["gap_ppm"]).sum()) // n
        assert set(out["ece_ppm"]) == {ece}
        assert (out["gap_ppm"]
                == (out["acc_ppm"] - out["conf_ppm"]).abs()).all()

    def test_cuped_identity(self, ray_session, corpus):
        import __ray_entry__ as entrymod

        _, d = corpus
        out = entrymod._q_cuped_adjust(d).iloc[0]
        assert out["adj_uplift_ppm"] \
            == out["uplift_ppm"] - out["correction_ppm"]


@pytest.mark.parametrize("seed", SEEDS)
class TestTableOpInvariants:
    def test_elasticity_sign_self_consistency(self, ray_session,
                                              tmp_path, seed):
        import __ray_entry__ as entrymod

        rng = np.random.RandomState(seed)
        n = 400
        df = pd.DataFrame({
            "l_partkey": rng.randint(1, 40, n),
            "l_shipdate": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 60, n), unit="D"),
            "l_quantity": rng.randint(1, 50, n).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(10, 5000, n), 2)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))
        out = entrymod._q_price_elasticity(str(tmp_path)).to_pandas()
        assert len(out) > 0
        for _, r in out.iterrows():
            num = (r["q1"] - r["q0"]) \
                * (r["r1_cents"] * r["q0"] + r["r0_cents"] * r["q1"])
            den = (r["q1"] + r["q0"]) \
                * (r["r1_cents"] * r["q0"] - r["r0_cents"] * r["q1"])
            assert den != 0
            if num == 0:
                assert r["elasticity_ppm"] == 0
            else:
                assert (r["elasticity_ppm"] >= 0) \
                    == ((num > 0) == (den > 0))

    def test_chain_ladder_ibnr_nonneg_mature_closed(self, ray_session,
                                                    tmp_path, seed):
        import __ray_entry__ as entrymod

        rng = np.random.RandomState(seed)
        n_orders, n_li = 60, 400
        od = rng.randint(0, 300, n_orders)
        orders = pd.DataFrame({
            "o_orderkey": np.arange(1, n_orders + 1),
            "o_orderdate": pd.Timestamp("1970-01-01")
            + pd.to_timedelta(od, unit="D")})
        ok = rng.randint(1, n_orders + 1, n_li)
        li = pd.DataFrame({
            "l_orderkey": ok,
            "l_shipdate": pd.Timestamp("1970-01-01")
            + pd.to_timedelta(od[ok - 1]
                              + rng.randint(0, 120, n_li), unit="D"),
            "l_extendedprice": np.round(
                rng.uniform(1, 100, n_li), 2)})
        pq.write_table(pa.Table.from_pandas(orders,
                                            preserve_index=False),
                       os.path.join(tmp_path, "orders.parquet"))
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                       os.path.join(tmp_path, "lineitem.parquet"))
        out = entrymod._q_chain_ladder(str(tmp_path))
        assert (out["ibnr_cents"] >= 0).all()
        mature = out[out["age"] == 3]
        assert (mature["ibnr_cents"] == 0).all()

    def test_ipf_lang_margin_shortfall_bound(self, ray_session,
                                             tmp_path, seed):
        import __ray_entry__ as entrymod

        rng = np.random.RandomState(seed)
        n = 300
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype="int64"),
            "source": rng.choice(["s0", "s1", "s2"], n),
            "lang": rng.choice(["en", "de", "fr"], n,
                               p=[0.6, 0.25, 0.15])})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = entrymod._q_ipf_raking(str(tmp_path))
        full = df.groupby("lang").size().to_dict()
        for lang, grp in out.groupby("lang"):
            target = 1_000_000 * int(full[lang])
            got = int((grp["n_samp"] * grp["w2_ppm"]).sum())
            n_l = int(grp["n_samp"].sum())
            assert 0 <= target - got < n_l  # one-sided, < 1 ppm/row

    def test_jackknife_reconstruction(self, ray_session, tmp_path,
                                      seed):
        import __ray_entry__ as entrymod

        rng = np.random.RandomState(seed)
        n = 200
        df = pd.DataFrame({
            "source": rng.choice(["a", "b", "c", "d"], n),
            "lang": rng.choice(["en", "zh"], n)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(tmp_path, "documents.parquet"))
        out = entrymod._q_jackknife_sources(str(tmp_path))
        N, E = int(out["n_docs"].sum()), int(out["n_en"].sum())
        assert set(out["share_full_ppm"]) == {1_000_000 * E // N}
        for _, r in out.iterrows():
            expect = 1_000_000 * (E - r["n_en"]) // (N - r["n_docs"])
            assert r["share_wo_ppm"] == expect
            assert r["influence_ppm"] \
                == r["share_wo_ppm"] - r["share_full_ppm"]
