"""skipgram_pair_counts / collocation_lift (stages/textstats.py):
window semantics, doc-boundary isolation, whitespace-rule tokenization,
and exact integer lift arithmetic."""
import numpy as np
import pyarrow as pa


def _counts(ds):
    df = ds.to_pandas()
    return {(l, r): int(n) for l, r, n in
            zip(df["left_tok"], df["right_tok"], df["n"])}


def test_skipgram_window_and_doc_boundary(ray_session):
    import ray.data

    from documentai_ray.stages.textstats import skipgram_pair_counts

    docs = pa.table({"text": pa.array(
        ["a b c d", "c d", None, "", "  x \t y\n"], pa.string())})
    out = _counts(skipgram_pair_counts(
        ray.data.from_arrow(docs), window=2))
    # doc1 d<=2 pairs: ab ac bc bd cd; doc2: cd; doc5: xy
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
                   ("b", "d"): 1, ("c", "d"): 2, ("x", "y"): 1}
    # window=1 drops the distance-2 pairs
    out1 = _counts(skipgram_pair_counts(
        ray.data.from_arrow(docs), window=1))
    assert ("a", "c") not in out1 and out1[("c", "d")] == 2


def test_skipgram_min_count_prunes(ray_session):
    import ray.data

    from documentai_ray.stages.textstats import skipgram_pair_counts

    docs = pa.table({"text": pa.array(
        ["p q", "p q", "p q", "r s"], pa.string())})
    out = _counts(skipgram_pair_counts(
        ray.data.from_arrow(docs), window=1, min_count=2))
    assert out == {("p", "q"): 3}


def test_skipgram_rejects_bad_window(ray_session):
    import pytest
    import ray.data

    from documentai_ray.stages.textstats import skipgram_pair_counts

    with pytest.raises(ValueError):
        skipgram_pair_counts(
            ray.data.from_arrow(pa.table({"text": ["a"]})), window=0)


def test_collocation_lift_exact(ray_session):
    import ray.data

    from documentai_ray.stages.textstats import collocation_lift

    # 6 docs "a b", so c_ab=6, c_a=6, c_b=6, T=12:
    # lift = 6*12/(6*6) = 2.0 -> 2_000_000 ppm exactly
    docs = pa.table({"text": pa.array(["a b"] * 6, pa.string())})
    df = collocation_lift(ray.data.from_arrow(docs),
                          min_pair=5).to_pandas()
    assert len(df) == 1
    assert int(df["n_pair"][0]) == 6
    assert int(df["lift_ppm"][0]) == 2_000_000
