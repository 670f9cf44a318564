"""Normalization, chunking, and sequence-packing curation operators."""

from __future__ import annotations

import pyarrow as pa


def test_normalize_text_nfc_and_whitespace():
    from documentai_ray.stages.curation import normalize_text

    assert normalize_text("naïve") == "naïve"          # NFC compose
    assert normalize_text("  a\t\tb\n\nc  ") == "a b c"
    assert normalize_text("") == ""


def test_normalize_batch_counts():
    from documentai_ray.stages.curation import normalize_batch

    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["ab  ç"], pa.large_string())})
    out = normalize_batch(batch)
    assert out.column("norm_text").to_pylist() == ["ab ç"]
    assert out.column("n_chars_raw").to_pylist() == [6]
    assert out.column("n_chars_norm").to_pylist() == [4]


def test_chunk_batch_windows():
    from documentai_ray.stages.curation import chunk_batch, chunk_tokens

    # 10 tokens, window 4, stride 3 -> chunks start at 0,3,6 (6+4 >= 10)
    assert chunk_tokens(10, 4, 3) == 3
    assert chunk_tokens(4, 4, 3) == 1
    assert chunk_tokens(5, 4, 3) == 2
    toks = " ".join(str(i) for i in range(10))
    batch = pa.table({"doc_id": pa.array([5], pa.int64()),
                      "text": pa.array([toks], pa.large_string())})
    out = chunk_batch(batch, window=4, stride=3)
    assert out.column("chunk_id").to_pylist() == [0, 1, 2]
    assert out.column("chunk_text").to_pylist()[1] == "3 4 5 6"
    assert out.column("chunk_text").to_pylist()[2] == "6 7 8 9"
    assert out.column("chunk_tokens").to_pylist() == [4, 4, 4]


def test_chunk_batch_short_and_empty_doc():
    from documentai_ray.stages.curation import chunk_batch

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a b", ""], pa.large_string())})
    out = chunk_batch(batch, window=4, stride=3)
    # "" splits to [''] -> one 1-token chunk of empty text (SQL mirror)
    assert out.column("doc_id").to_pylist() == [1, 2]
    assert out.column("chunk_tokens").to_pylist() == [2, 1]
    assert out.column("chunk_text").to_pylist() == ["a b", ""]


def test_pack_sequences_greedy(ray_session):
    import ray.data

    from documentai_ray.stages.curation import pack_sequences

    def doc(n):
        return " ".join("t" * 1 for _ in range(n))

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 10], pa.int64()),
        "source": pa.array(["a", "a", "a", "a", "b"], pa.string()),
        # budget 10: costs 6,5 -> bins 0,1; 4 joins bin 1 (5+4=9); 9 -> bin 2
        "text": pa.array([doc(6), doc(5), doc(4), doc(9), doc(25)],
                         pa.large_string()),
    })
    out = pack_sequences(ray.data.from_arrow(t), budget=10,
                         num_partitions=4).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[1, "bin_id"] == 0
    assert out.loc[2, "bin_id"] == 1
    assert out.loc[3, "bin_id"] == 1
    assert out.loc[4, "bin_id"] == 2
    # doc longer than budget is capped to a full bin of its own
    assert out.loc[10, "cost"] == 10
    assert out.loc[10, "n_tokens"] == 25
    assert out.loc[10, "bin_id"] == 0


def test_gopher_quality_rules():
    from documentai_ray.stages.curation import gopher_quality

    nw, mwl, sym, bull, keep = gopher_quality(" ".join(["word"] * 60))
    assert (nw, mwl, sym, bull) == (60, 4_000_000, 0, 0)
    assert keep
    # too few words
    assert gopher_quality("just a few words here")[4] is False
    # bullet-heavy text fails the bullet ratio
    heavy = "\n".join(["- item " + " ".join(["w"] * 10)] * 10)
    nw2, _, _, bull2, keep2 = gopher_quality(heavy)
    assert bull2 == 1_000_000 and keep2 is False
    # empty text: all zeros, rejected
    assert gopher_quality("") == (0, 0, 0, 0, False)
