"""Inverted index, TF-IDF top-k, canonical-URL dedup."""

from __future__ import annotations

import pyarrow as pa


def _docs_table():
    return pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a c", "b c", "c"], pa.large_string()),
    })


def test_inverted_index_postings(ray_session):
    import ray.data

    from documentai_ray.stages.indexing import inverted_index

    out = inverted_index(ray.data.from_arrow(_docs_table()),
                         num_partitions=4).to_pandas()
    out = out.set_index("token")
    assert out.loc["a", "df"] == 1 and list(out.loc["a", "postings"]) == [1]
    assert out.loc["b", "df"] == 2 and list(out.loc["b", "postings"]) == [1, 2]
    assert out.loc["c", "df"] == 3 and list(out.loc["c", "postings"]) == [1, 2, 3]


def test_inverted_index_max_postings(ray_session):
    import ray.data

    from documentai_ray.stages.indexing import inverted_index

    out = inverted_index(ray.data.from_arrow(_docs_table()),
                         num_partitions=4, max_postings=2).to_pandas()
    out = out.set_index("token")
    # df stays TRUE even when the stored list is truncated
    assert out.loc["c", "df"] == 3 and list(out.loc["c", "postings"]) == [1, 2]


def test_tfidf_topk_rarity_wins(ray_session):
    import ray.data

    from documentai_ray.stages.indexing import tfidf_topk

    out = tfidf_topk(ray.data.from_arrow(_docs_table()), k=2).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("term_rank")
    # doc 1: tf(a)=2,df=1 -> 2M ppm; tf(b)=1,df=2 -> 500k; tf(c)=1,df=3 -> 333333
    assert list(d1["token"]) == ["a", "b"]
    assert list(d1["score_ppm"]) == [2_000_000, 500_000]
    d3 = out[out["doc_id"] == 3]
    assert list(d3["token"]) == ["c"]
    assert list(d3["score_ppm"]) == [333_333]


def test_canonical_url_dedup(ray_session):
    import ray.data

    from documentai_ray.stages.dedup import dedup_canonical_url

    t = pa.table({
        "url": pa.array(["http://x/p/1", "http://x/p/1?amp=1",
                         "http://x/p/2#frag", "http://x/p/1?utm=z"],
                        pa.string()),
        "text": pa.array(["base", "amp", "two", "utm"], pa.large_string()),
    })
    out = dedup_canonical_url(ray.data.from_arrow(t),
                              num_partitions=2).to_pandas()
    out = out.set_index("canonical_url")
    assert out.loc["http://x/p/1", "url"] == "http://x/p/1"
    assert out.loc["http://x/p/1", "text"] == "base"
    assert out.loc["http://x/p/1", "n_variants"] == 3
    assert out.loc["http://x/p/2", "url"] == "http://x/p/2#frag"
    assert out.loc["http://x/p/2", "n_variants"] == 1


class TestKwic:
    def test_window_clamps_at_edges(self, ray_session):
        from documentai_ray.stages.indexing import kwic_snippets
        import pyarrow as pa
        docs = pa.table({"id": pa.array([1, 2], pa.int64()),
                         "text": pa.array(
                             ["hit b c d e", "a b c d hit", ],
                             pa.string())})
        out = (kwic_snippets(ray_session.data.from_arrow(docs),
                             id_cols=["id"], text_col="text",
                             keyword="hit", before=3, after=3)
               .to_pandas().sort_values("id"))
        assert list(out["pos"]) == [1, 5]
        assert list(out["snippet"]) == ["hit b c d", "b c d hit"]

    def test_multiple_hits_and_misses(self, ray_session):
        from documentai_ray.stages.indexing import kwic_snippets
        import pyarrow as pa
        docs = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                         "text": pa.array(
                             ["x hit y hit z", "no match here", None],
                             pa.string())})
        out = (kwic_snippets(ray_session.data.from_arrow(docs),
                             id_cols=["id"], text_col="text",
                             keyword="hit", before=1, after=1)
               .to_pandas().sort_values("pos"))
        assert list(out["id"]) == [1, 1]
        assert list(out["pos"]) == [2, 4]
        assert list(out["snippet"]) == ["x hit y", "y hit z"]

    def test_rejects_negative_window(self, ray_session):
        import pytest
        from documentai_ray.stages.indexing import kwic_snippets
        with pytest.raises(ValueError):
            kwic_snippets(ray_session.data.from_items([{"id": 1,
                                                        "text": "a"}]),
                          id_cols=["id"], text_col="text",
                          keyword="a", before=-1)


class TestRRF:
    def test_fusion_beats_single_list_winner(self, ray_session):
        """Item best on one list but terrible on the other loses to a
        consistently-good item — the point of RRF."""
        import duckdb
        import pandas as pd
        from documentai_ray.stages.indexing import rrf_fuse
        rows = [
            {"id": 1, "a": 100, "b": 1},    # 1st on a, last on b
            {"id": 2, "a": 90, "b": 90},    # 2nd on both
            {"id": 3, "a": 1, "b": 100},    # last on a, 1st on b
            {"id": 4, "a": 50, "b": 50},
        ]
        out = rrf_fuse(ray_session.data.from_items(rows).repartition(2),
                       id_col="id", score_cols=["a", "b"], k=60,
                       top_n=4).to_pandas()
        assert list(out["id"])[0] == 2    # consistent beats specialists
        df = pd.DataFrame(rows)
        want = duckdb.sql(
            "SELECT id, 1000000000 // (60 + rank() OVER (ORDER BY a "
            "DESC)) + 1000000000 // (60 + rank() OVER (ORDER BY b "
            "DESC)) AS rrf FROM df ORDER BY rrf DESC, id").df()
        assert list(out["id"]) == list(want["id"])
        assert list(out["rrf"]) == list(want["rrf"])

    def test_min_rank_ties_and_id_tiebreak(self, ray_session):
        from documentai_ray.stages.indexing import rrf_fuse
        rows = [{"id": i, "a": 7, "b": 7} for i in range(5)]
        out = rrf_fuse(ray_session.data.from_items(rows),
                       id_col="id", score_cols=["a", "b"],
                       top_n=3).to_pandas()
        # all tied at rank 1 on both lists -> id ascending wins
        assert list(out["id"]) == [0, 1, 2]
        assert len(set(out["rrf"])) == 1

    def test_rejects_bad_params(self, ray_session):
        import pytest
        from documentai_ray.stages.indexing import rrf_fuse
        ds = ray_session.data.from_items([{"id": 1, "a": 1}])
        with pytest.raises(ValueError):
            rrf_fuse(ds, id_col="id", score_cols=["a"], k=0)
        with pytest.raises(ValueError):
            rrf_fuse(ds, id_col="id", score_cols=["a"], top_n=0)


class TestShortestUniquePrefix:
    def _run(self, ray_session, names):
        from documentai_ray.stages.indexing import shortest_unique_prefix
        ds = ray_session.data.from_items(
            [{"name": n} for n in names]).repartition(2)
        out = shortest_unique_prefix(ds, col="name").to_pandas()
        return dict(zip(out["name"], out["plen"]))

    def test_neighbour_lcp_and_strict_prefix_cap(self, ray_session):
        """car|cart share 3 chars; car is a strict prefix so it caps
        at its own length; dog is unique at one char."""
        got = self._run(ray_session, ["car", "cart", "dog"])
        assert got == {"car": 3, "cart": 4, "dog": 1}

    def test_cross_bucket_is_one(self, ray_session):
        """Different first chars -> LCP 0 -> plen 1, and duplicates
        collapse before the computation."""
        got = self._run(ray_session, ["apple", "banana", "banana"])
        assert got == {"apple": 1, "banana": 1}

    def test_empty_string_and_one_char(self, ray_session):
        got = self._run(ray_session, ["", "a", "ab"])
        assert got == {"": 0, "a": 1, "ab": 2}


class TestZonemapPrune:
    def test_hand_computed_band(self, ray_session):
        """ids 0..127, val=10*id, buckets of 64: bucket 0 (max 630)
        prunes under [700, 900]; 21 of 64 scanned rows match."""
        from documentai_ray.stages.indexing import zonemap_prune
        ds = ray_session.data.from_items(
            [{"i": i, "v": 10 * i} for i in range(128)]).repartition(3)
        out = zonemap_prune(ds, id_col="i", val_col="v",
                            bucket_size=64, lo=700, hi=900) \
            .to_pandas().iloc[0]
        assert (out["n_buckets"], out["n_pruned"], out["n_rows"],
                out["n_scanned"], out["n_matched"]) == (2, 1, 128, 64, 21)
        assert out["prune_ppm"] == 500_000
        assert out["waste_ppm"] == 1_000_000 * (64 - 21) // 64

    def test_rejects_bad_params(self, ray_session):
        import pytest
        from documentai_ray.stages.indexing import zonemap_prune
        ds = ray_session.data.from_items([{"i": 1, "v": 1}])
        with pytest.raises(ValueError):
            zonemap_prune(ds, id_col="i", val_col="v",
                          bucket_size=0, lo=0, hi=1)
        with pytest.raises(ValueError):
            zonemap_prune(ds, id_col="i", val_col="v",
                          bucket_size=8, lo=5, hi=4)
