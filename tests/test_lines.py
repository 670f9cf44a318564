"""Line-level corpus operators: corpus-wide line dedup + C4 line filter."""

from __future__ import annotations

import pyarrow as pa


def test_dedup_lines_first_occurrence(ray_session):
    import ray.data

    from documentai_ray.stages.lines import dedup_lines

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "text": pa.array(["a\nb\nc", "b\nd", "a\nb"], pa.large_string()),
    })
    out = dedup_lines(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    out = out.set_index("url")
    assert out.loc["u1", "text_dedup"] == "a\nb\nc"
    assert out.loc["u2", "text_dedup"] == "d"
    assert out.loc["u2", "n_kept"] == 1
    assert out.loc["u2", "n_total"] == 2
    # doc 3's every line already occurred -> inner-join semantics drop it
    assert "u3" not in out.index


def test_dedup_lines_within_doc_duplicates(ray_session):
    import ray.data

    from documentai_ray.stages.lines import dedup_lines

    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "url": pa.array(["u7"], pa.string()),
        "text": pa.array(["x\nx\ny\nx"], pa.large_string()),
    })
    out = dedup_lines(ray.data.from_arrow(t), num_partitions=2).to_pandas()
    assert out.loc[0, "text_dedup"] == "x\ny"
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[0, "n_total"] == 4


def test_dedup_lines_order_is_doc_then_index(ray_session):
    """A line in a LATER doc at an EARLIER index loses to the earlier doc."""
    import ray.data

    from documentai_ray.stages.lines import dedup_lines

    t = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "url": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["keep\nshared", "shared\nmine"], pa.large_string()),
    })
    out = dedup_lines(ray.data.from_arrow(t), num_partitions=2).to_pandas()
    out = out.set_index("url")
    assert out.loc["a", "text_dedup"] == "keep\nshared"
    assert out.loc["b", "text_dedup"] == "mine"


def test_c4_filter_rules():
    from documentai_ray.stages.lines import c4_filter_text

    text = "\n".join([
        "one two three four five",
        "short line",
        "has { brace in it long enough",
        "ends with colon one two three four:",
        "another good line with six words",
    ])
    clean, kept, total = c4_filter_text(text)
    assert total == 5
    assert kept == 2
    assert clean.split("\n") == [
        "one two three four five",
        "another good line with six words",
    ]


def test_c4_filter_batch_schema():
    from documentai_ray.stages.lines import c4_line_filter_batch

    batch = pa.table({"url": ["u"], "text": pa.array(["a b c d e f"], pa.large_string())})
    out = c4_line_filter_batch(batch)
    assert out.column("clean_text").to_pylist() == ["a b c d e f"]
    assert out.column("n_lines_kept").to_pylist() == [1]
    assert out.column("n_lines").to_pylist() == [1]
