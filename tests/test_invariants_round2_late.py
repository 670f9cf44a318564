"""Engine-level invariants for the 9th-continuation statistical folds,
driven over randomized (seeded, deterministic) tiny event tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _rand_events(seed, n_users=12, n_events=120, span_days=20):
    rng = np.random.default_rng(seed)
    users = rng.integers(1, n_users + 1, n_events)
    offs = rng.integers(0, span_days * 86400, n_events)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(offs, unit="s")
    types = rng.choice(["view", "click", "purchase", "error"], n_events)
    return pd.DataFrame({"user_id": users, "ts": ts,
                         "event_type": types,
                         "event_id": np.arange(n_events)})


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_km_curve_monotone_and_bounded(ray_session, seed):
    import ray.data

    from documentai_ray.stages.windows import km_survival_int

    ev = _rand_events(seed)
    km = km_survival_int(ray.data.from_pandas(ev), horizon_days=25,
                         censor_gap_hours=1)
    s = km["s_ppm"].to_numpy()
    ar = km["at_risk"].to_numpy()
    assert ((s >= 0) & (s <= 1_000_000)).all()
    assert (np.diff(s) <= 0).all(), "survival must never rise"
    assert (np.diff(ar) <= 0).all(), "at-risk must never grow"
    assert (km["deaths"].to_numpy() <= ar).all()
    # hazard consistency: s drops exactly when deaths occur
    drops = np.diff(s) < 0
    assert (km["deaths"].to_numpy()[1:][drops] > 0).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_markov_fold_conserves_mass_up_to_truncation(ray_session, seed):
    import ray.data

    from documentai_ray.stages.windows import markov_kstep_int

    ev = _rand_events(seed, n_events=200)
    out = markov_kstep_int(ray.data.from_pandas(ev), steps=4)
    tn = len(out)
    total0 = int(out["p0_ppm"].sum())
    totalk = int(out["pk_ppm"].sum())
    assert total0 <= 1_000_000
    assert totalk <= total0
    # each of the 4 steps loses < tn ppm to row-truncation, plus the
    # per-step floor loses < tn; generous bound: 5 rounds × (2·tn + 1)
    assert totalk >= total0 - 5 * (2 * tn + 1) * tn


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dispersion_and_leadlag_consistency(ray_session, seed):
    import ray.data

    from documentai_ray.stages.windows import (dispersion_index_int,
                                               leadlag_beta_int)

    ev = _rand_events(seed, n_events=300, span_days=4)
    disp = dispersion_index_int(ray.data.from_pandas(ev))
    assert (disp["dispersion_ppm"] >= 0).all()
    # the flag compares UN-truncated sides, so it must agree with the
    # truncated ratio away from the exact Poisson line
    for _, r in disp.iterrows():
        if r["dispersion_ppm"] > 1_000_000:
            assert bool(r["overdispersed"])
        if r["dispersion_ppm"] < 1_000_000:
            assert not bool(r["overdispersed"])
    ll = leadlag_beta_int(ray.data.from_pandas(ev), x_type="click",
                          y_type="purchase", lags=(0, 1, 2))
    assert len(ll) == 3
    assert (ll["n_obs"] == ll["n_obs"].iloc[0]).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_logrank_pools_to_km_death_total(ray_session, seed):
    import ray.data

    from documentai_ray.stages.windows import (km_survival_int,
                                               logrank_test_int)

    ev = _rand_events(seed, n_users=20, n_events=160)
    km = km_survival_int(ray.data.from_pandas(ev), horizon_days=25,
                         censor_gap_hours=1)
    lr = logrank_test_int(ray.data.from_pandas(ev), horizon_days=25,
                          censor_gap_hours=1).iloc[0]
    # arm deaths can never exceed the pooled KM deaths, and the arm
    # split must cover every subject
    assert lr["o1"] <= int(km["deaths"].sum())
    assert lr["n_treat"] + lr["n_ctrl"] == ev["user_id"].nunique()
    assert lr["v_ppm"] >= 0
