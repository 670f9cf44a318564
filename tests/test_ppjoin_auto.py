"""prefix_filter_pairs df auto-selection (VERDICT r2 what's-wrong #1):
above ``max_broadcast_vocab`` the AllPairs frequency table must never be
materialized as a driver-side dict — the plan drops to hash order, which
stays exact (any fixed total order preserves the prefix guarantee)."""

import pandas as pd
import pyarrow as pa


def _corpus():
    rows = []
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    for i in range(30):
        rows.append({"url": f"u{i:03d}", "text": f"{base} doc {i} words"})
    rows.append({"url": "u900", "text": base + " doc 3 words"})  # dup of u003
    return pa.Table.from_pylist(rows)


def _verified_pairs(ds, **kw):
    """Candidates under the given order, then EXACT verification (the
    public contract: any fixed total order yields the same verified set).
    broadcast_limit=0 keeps the verifier on its distributed plan so the
    only possible dict ``ray.put`` is the df table under test."""
    from documentai_ray.stages.dedup import prefix_filter_pairs, verify_jaccard_pairs

    cand = prefix_filter_pairs(ds, **kw)
    out = verify_jaccard_pairs(ds, cand, broadcast_limit=0).to_pandas()
    if out.empty:
        return set()
    return set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))


def test_auto_falls_back_to_hash_order_without_driver_dict(ray_session, monkeypatch):
    import ray
    import ray.data

    ds = ray.data.from_arrow(_corpus()).repartition(4)
    broadcast = _verified_pairs(ds, freq_order=True)
    assert ("u003", "u900") in broadcast

    put_dicts = []
    real_put = ray.put

    def spy_put(obj, *a, **kw):
        if isinstance(obj, dict):
            put_dicts.append(len(obj))
        return real_put(obj, *a, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    auto_over_cap = _verified_pairs(ds, freq_order="auto", max_broadcast_vocab=10)
    assert put_dicts == [], "df dict broadcast despite vocab over the cap"
    assert auto_over_cap == broadcast  # exactness survives the order change

    auto_default = _verified_pairs(ds, freq_order="auto")
    assert put_dicts and auto_default == broadcast  # small vocab → broadcast
