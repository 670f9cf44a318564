"""Repeated-passage detection (k-token exact substring dedup)."""

from __future__ import annotations

import pyarrow as pa


def test_repeated_spans_cross_doc(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import repeated_spans

    shared = "p q r s"  # 4-token passage shared by docs 1 and 2
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"a b {shared} c d",
                          f"x {shared} y z w",
                          "m n o u v t k l"], pa.large_string()),
    })
    out = repeated_spans(ray.data.from_arrow(t), k=4,
                         num_partitions=4).to_pandas()
    out = out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    # doc 1: tokens a b p q r s c d -> only shingle (p q r s) at pos 2 dups
    d1 = out[out["doc_id"] == 1]
    assert list(d1["span_start"]) == [2] and list(d1["span_end"]) == [6]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["span_start"]) == [1] and list(d2["span_end"]) == [5]
    assert (out["doc_id"] != 3).all()


def test_repeated_spans_merge_overlapping(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import repeated_spans

    # identical docs -> every shingle duplicated -> one full-doc span each
    text = "a b c d e f g h i j"
    t = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array([text, text], pa.large_string()),
    })
    out = repeated_spans(ray.data.from_arrow(t), k=4,
                         num_partitions=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 2
    assert list(out["span_start"]) == [0, 0]
    assert list(out["span_end"]) == [10, 10]
    assert list(out["n_shingles"]) == [7, 7]


def test_repeated_spans_within_doc(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import repeated_spans

    # the same 4-gram appears twice INSIDE one doc (positions 0 and 6)
    t = pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array(["a b c d x y a b c d"], pa.large_string()),
    })
    out = repeated_spans(ray.data.from_arrow(t), k=4,
                         num_partitions=2).to_pandas()
    out = out.sort_values("span_start").reset_index(drop=True)
    assert list(out["span_start"]) == [0, 6]
    assert list(out["span_end"]) == [4, 10]


def test_remove_repeated_spans(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import remove_repeated_spans, repeated_spans

    text = "a b c d e f g h"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([text, text, "u v w x y z q r"], pa.large_string()),
    })
    ds = ray.data.from_arrow(t)
    spans = repeated_spans(ds, k=4, num_partitions=2)
    out = remove_repeated_spans(ds, spans, num_partitions=2).to_pandas()
    out = out.set_index("doc_id").sort_index()
    # duplicated docs lose everything; the unique doc is untouched
    assert out.loc[1, "text_dedup"] == "" and out.loc[1, "n_tokens_removed"] == 8
    assert out.loc[2, "text_dedup"] == ""
    assert out.loc[3, "text_dedup"] == "u v w x y z q r"
    assert out.loc[3, "n_tokens_removed"] == 0
    assert out.loc[3, "n_tokens_total"] == 8
