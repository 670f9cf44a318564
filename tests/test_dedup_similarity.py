"""Dedup suite (exact / MinHash-LSH / SimHash / Jaccard) and similarity
search (brute-force + LSH ANN) tests."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.stages import dedup
from tests.conftest import SF_SMOKE


class TestJaccardAndSignatures:
    def test_ngram_jaccard(self):
        a = "one two three four five six seven eight nine ten"
        assert dedup.ngram_jaccard(a, a) == 1.0
        assert dedup.ngram_jaccard(a, "") == 0.0
        # short/empty texts have an empty shingle set and never pair —
        # mirrors the SQL oracle's generate_series semantics (ADVICE r1)
        assert dedup.ngram_jaccard("", "") == 0.0
        assert dedup.ngram_jaccard("one two", "one two") == 0.0
        b = a + " eleven"
        j = dedup.ngram_jaccard(a, b)
        assert 0.8 < j < 1.0

    def test_blocked_jaccard_pairs_matches_bruteforce(self):
        """Inverted-index co-occurrence counter == brute-force pairwise
        ngram_jaccard within blocks (exactness contract)."""
        import itertools

        import ray.data

        rows = []
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [base, base + " extra", "totally different words here now ok",
                 base.replace("gamma", "mu"), "short", ""]
        for blk in ("x", "y"):
            for i, t in enumerate(texts):
                rows.append({"doc_id": len(rows), "source": blk, "text": t})
        ds = ray.data.from_items(rows)
        got = dedup.blocked_jaccard_pairs(
            ds, id_col="doc_id", block_col="source", threshold=0.5, k=3
        ).to_pandas()
        got_pairs = set(zip(got["id_a"], got["id_b"]))
        want = set()
        by_blk: dict = {}
        for r in rows:
            by_blk.setdefault(r["source"], []).append(r)
        for blk_rows in by_blk.values():
            for a, b in itertools.combinations(blk_rows, 2):
                if dedup.ngram_jaccard(a["text"], b["text"], k=3) >= 0.5:
                    want.add((min(a["doc_id"], b["doc_id"]),
                              max(a["doc_id"], b["doc_id"])))
        assert got_pairs == want
        assert want  # non-trivial fixture

    def test_minhash_estimates_jaccard(self):
        a_txt = " ".join(f"w{i}" for i in range(100))
        b_txt = " ".join(f"w{i}" for i in range(90)) + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
        pa_, pb_ = dedup.make_permutations(256)
        sa = dedup.minhash_signature(a_txt, pa_, pb_)
        sb = dedup.minhash_signature(b_txt, pa_, pb_)
        est = (sa == sb).mean()
        true_j = dedup.ngram_jaccard(a_txt, b_txt)
        assert abs(est - true_j) < 0.15

    def test_minhash_deterministic(self):
        pa_, pb_ = dedup.make_permutations(64)
        s1 = dedup.minhash_signature("hello world foo bar baz", pa_, pb_)
        s2 = dedup.minhash_signature("hello world foo bar baz", pa_, pb_)
        assert (s1 == s2).all()

    def test_simhash_properties(self):
        a = "the quick brown fox jumps over the lazy dog again and again ok"
        h1 = dedup.simhash64(a)
        h2 = dedup.simhash64(a + " extra")
        h3 = dedup.simhash64("completely different words here nothing shared at all")
        assert h1 == dedup.simhash64(a)
        assert dedup.hamming64(h1, h2) < dedup.hamming64(h1, h3)

    def test_empty_signature(self):
        pa_, pb_ = dedup.make_permutations(8)
        s = dedup.minhash_signature("", pa_, pb_)
        assert (s == np.iinfo(np.uint64).max).all()


class TestExactDedup:
    def test_dedup_latest(self, ray_session):
        import ray.data

        rows = [
            {"url": "u1", "warc_ts": 1, "v": "old"},
            {"url": "u1", "warc_ts": 5, "v": "new"},
            {"url": "u2", "warc_ts": 3, "v": "only"},
        ]
        out = dedup.dedup_latest(ray_session.data.from_items(rows)).take_all()
        got = {r["url"]: r["v"] for r in out}
        assert got == {"u1": "new", "u2": "only"}

    def test_dedup_exact_first(self, ray_session):
        rows = [
            {"id": 3, "text": "same content"},
            {"id": 1, "text": "same content"},
            {"id": 2, "text": "different content"},
        ]
        ds = ray_session.data.from_items(rows)
        out = dedup.dedup_exact_first(ds, id_col="id", content_col="text").take_all()
        assert sorted(r["id"] for r in out) == [1, 2]


class TestLshPipeline:
    def test_planted_neardups_found(self, ray_session):
        from documentai_ray.sources.pages import pages_dataset
        from documentai_ray.stages.extract import extract_batch

        ds = pages_dataset(SF_SMOKE, with_dups=False, with_near_dups=True)
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
        ds = ds.select_columns(["url", "text"])
        texts = {r["url"]: r["text"] for r in ds.take_all()}
        cand = dedup.lsh_candidate_pairs(ds, id_col="url").take_all()
        cand_pairs = {(r["id_a"], r["id_b"]) for r in cand}
        # every planted (base, amp) pair must be a candidate
        planted = {
            (u[: -len("?amp=1")], u) for u in texts if u.endswith("?amp=1")
        }
        assert planted, "corpus should contain planted near-dups"
        missing = {
            p for p in planted
            if p not in cand_pairs and (p[1], p[0]) not in cand_pairs
        }
        assert not missing
        # verification kills non-similar candidate pairs
        verified = {
            p for p in cand_pairs
            if dedup.ngram_jaccard(texts.get(p[0], ""), texts.get(p[1], "")) >= 0.8
            and texts.get(p[0], "") != ""
        }
        assert planted <= verified


class TestSimilaritySearch:
    def _mk(self, ray_session, n=200, d=16, seed=0):
        rng = np.random.RandomState(seed)
        M = rng.standard_normal((n, d))
        rows = [{"vec_id": i, "embedding": M[i].tolist(), "label": i % 4}
                for i in range(n)]
        return ray_session.data.from_items(rows), M

    def test_brute_force_matches_numpy(self, ray_session):
        from documentai_ray.stages.similarity import brute_force_topk

        ds, M = self._mk(ray_session)
        q = M[0]
        top = brute_force_topk(ds, q, k=5, exclude_ids={0})
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        scores = Mn @ (q / np.linalg.norm(q))
        scores[0] = -np.inf
        want = set(np.argsort(-scores)[:5].tolist())
        assert set(top["vec_id"]) == want
        assert (top["score"].to_numpy()[:-1] >= top["score"].to_numpy()[1:]).all()

    def test_lsh_topk_recall_on_clustered_data(self, ray_session):
        # plant 10 true neighbors close to the query; LSH must recover most
        # (random unclustered data is the adversarial case where any LSH
        # degrades — planted-neighbor recall is the meaningful metric)
        from documentai_ray.stages.similarity import brute_force_topk, lsh_topk

        rng = np.random.RandomState(3)
        q = rng.standard_normal(16)
        rows = []
        for i in range(10):  # near neighbors
            rows.append({"vec_id": i, "embedding": (q + 0.05 * rng.standard_normal(16)).tolist(),
                         "label": 0})
        for i in range(10, 300):  # background
            rows.append({"vec_id": i, "embedding": rng.standard_normal(16).tolist(),
                         "label": 0})
        ds = ray_session.data.from_items(rows)
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        assert exact == set(range(10))
        approx = set(lsh_topk(ds, q, k=10, dim=16, n_bits=6)["vec_id"])
        assert len(exact & approx) >= 8

    def test_neardup_pairs_threshold(self, ray_session):
        from documentai_ray.stages.similarity import embedding_neardup_pairs

        rng = np.random.RandomState(1)
        base = rng.standard_normal(16)
        rows = [
            {"vec_id": 0, "embedding": base.tolist(), "label": 0},
            {"vec_id": 1, "embedding": (base + 0.01 * rng.standard_normal(16)).tolist(),
             "label": 0},
            {"vec_id": 2, "embedding": rng.standard_normal(16).tolist(), "label": 0},
            {"vec_id": 3, "embedding": base.tolist(), "label": 1},  # other block
        ]
        ds = ray_session.data.from_items(rows)
        out = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
        assert list(zip(out["id_a"], out["id_b"])) == [(0, 1)]


class TestIvf:
    def test_ivf_topk_recall_on_clustered_data(self, ray_session):
        from documentai_ray.stages.similarity import (
            IVFIndex,
            brute_force_topk,
            ivf_topk,
        )

        rng = np.random.RandomState(5)
        q = rng.standard_normal(16)
        rows = []
        for i in range(10):
            rows.append({"vec_id": i,
                         "embedding": (q + 0.05 * rng.standard_normal(16)).tolist(),
                         "label": 0})
        for i in range(10, 400):
            rows.append({"vec_id": i, "embedding": rng.standard_normal(16).tolist(),
                         "label": 0})
        M = np.asarray([r["embedding"] for r in rows])
        ds = ray_session.data.from_items(rows)
        index = IVFIndex(nlist=8, nprobe=3).train(M)
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        approx = set(ivf_topk(ds, q, k=10, index=index)["vec_id"])
        # the planted cluster shares one centroid → near-perfect recall
        assert len(exact & approx) >= 9

    def test_ivf_deterministic(self):
        from documentai_ray.stages.similarity import IVFIndex

        rng = np.random.RandomState(2)
        X = rng.standard_normal((100, 8))
        c1 = IVFIndex(nlist=4).train(X).centroids
        c2 = IVFIndex(nlist=4).train(X).centroids
        assert (c1 == c2).all()


class TestComponents:
    def test_chain_transitivity(self, ray_session):
        # chain a-b-c-d plus isolated e: all of a..d share component "a"
        ids = ray_session.data.from_items(
            [{"url": u} for u in ["a", "b", "c", "d", "e"]])
        pairs = ray_session.data.from_items(
            [{"id_a": "a", "id_b": "b"}, {"id_a": "b", "id_b": "c"},
             {"id_a": "c", "id_b": "d"}])
        from documentai_ray.stages.dedup import neardup_components

        out = {r["url"]: r["component"]
               for r in neardup_components(ids, pairs, max_iters=4).take_all()}
        assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}

    def test_survivors_are_min_per_component(self, ray_session):
        ids = ray_session.data.from_items([{"url": str(i)} for i in range(6)])
        pairs = ray_session.data.from_items(
            [{"id_a": "1", "id_b": "3"}, {"id_a": "3", "id_b": "5"},
             {"id_a": "0", "id_b": "2"}])
        from documentai_ray.stages.dedup import neardup_components

        comp = neardup_components(ids, pairs, max_iters=4).to_pandas()
        survivors = sorted(comp[comp["url"] == comp["component"]]["url"])
        assert survivors == ["0", "1", "4"]


class TestComponentsAuto:
    def test_small_path_matches_distributed(self, ray_session):
        from documentai_ray.stages.dedup import (
            neardup_components,
            neardup_components_auto,
        )

        ids = ray_session.data.from_items([{"url": str(i)} for i in range(8)])
        pairs_rows = [{"id_a": "1", "id_b": "3"}, {"id_a": "3", "id_b": "5"},
                      {"id_a": "5", "id_b": "7"}, {"id_a": "0", "id_b": "2"}]
        pairs1 = ray_session.data.from_items(pairs_rows)
        pairs2 = ray_session.data.from_items(pairs_rows)
        small = {r["url"]: r["component"]
                 for r in neardup_components_auto(ids, pairs1).take_all()}
        ids2 = ray_session.data.from_items([{"url": str(i)} for i in range(8)])
        dist = {r["url"]: r["component"]
                for r in neardup_components(ids2, pairs2, max_iters=5).take_all()}
        assert small == dist
        assert small["7"] == "1" and small["2"] == "0" and small["4"] == "4"

    def test_forced_distributed_path(self, ray_session):
        from documentai_ray.stages.dedup import neardup_components_auto

        ids = ray_session.data.from_items([{"url": "a"}, {"url": "b"}])
        pairs = ray_session.data.from_items([{"id_a": "a", "id_b": "b"}])
        out = {r["url"]: r["component"]
               for r in neardup_components_auto(ids, pairs,
                                                driver_limit=0,
                                                max_iters=3).take_all()}
        assert out == {"a": "a", "b": "a"}


class TestSimhashBanding:
    def test_guarantee_and_verification(self, ray_session):
        # contract: any pair with hamming distance < bands (4) shares at
        # least one exact 16-bit band -> MUST be found; reported pairs must
        # satisfy the max_hamming bound; far pairs must not appear.
        base = 0x0123_4567_89AB_CDEF
        rows = [
            {"id": "a", "simhash": base},
            {"id": "b", "simhash": base ^ 0b101},          # d=2  -> must find
            {"id": "c", "simhash": base ^ (1 << 63)},      # d=1  -> must find
            {"id": "d", "simhash": base ^ 0xFFFF_FFFF_FFFF_0000},  # far
        ]
        ds = ray_session.data.from_items(rows)
        pairs = dedup.simhash_candidate_pairs(ds, id_col="id",
                                              max_hamming=3).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert ("a", "b") in got and ("a", "c") in got
        assert all("d" not in p for p in got)

    def test_planted_corpus_pairs_best_effort(self, ray_session):
        from documentai_ray.sources.pages import pages_dataset
        from documentai_ray.stages.extract import extract_batch

        ds = pages_dataset(SF_SMOKE, with_dups=False, with_near_dups=True)
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
        ds = dedup.add_simhash(ds.select_columns(["url", "text"]))
        hashes = {r["url"]: r["simhash"]
                  for r in ds.select_columns(["url", "simhash"]).take_all()}
        pairs = dedup.simhash_candidate_pairs(
            ds.select_columns(["url", "simhash"]), id_col="url",
            max_hamming=20).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # precision: every reported pair satisfies the bound
        for a, b in got:
            assert dedup.hamming64(hashes[a], hashes[b]) <= 20
        # guarantee band: pairs closer than `bands` are always found
        planted = {(u[: -len("?amp=1")], u) for u in hashes if u.endswith("?amp=1")}
        guaranteed = {p for p in planted
                      if dedup.hamming64(hashes[p[0]], hashes[p[1]]) < 4}
        assert guaranteed <= got


class TestVerifyPairsPaths:
    def _fixtures(self, ray_session):
        texts = ray_session.data.from_items([
            {"url": "a", "text": "one two three four five six seven eight nine ten"},
            {"url": "b", "text": "one two three four five six seven eight nine ten extra"},
            {"url": "c", "text": "totally different words in this candidate document here"},
            {"url": "d", "text": ""},
        ])
        pairs = ray_session.data.from_items([
            {"id_a": "a", "id_b": "b"},   # J ~ 0.89 -> keep
            {"id_a": "a", "id_b": "c"},   # J ~ 0    -> drop
            {"id_a": "a", "id_b": "d"},   # empty    -> drop
        ])
        return texts, pairs

    def test_broadcast_path(self, ray_session):
        texts, pairs = self._fixtures(ray_session)
        out = dedup.verify_jaccard_pairs(texts, pairs, threshold=0.8).to_pandas()
        assert list(zip(out["id_a"], out["id_b"])) == [("a", "b")]

    def test_join_path_equals_broadcast(self, ray_session):
        texts, pairs = self._fixtures(ray_session)
        out = dedup.verify_jaccard_pairs(texts, pairs, threshold=0.8,
                                         broadcast_limit=0,
                                         num_partitions=4).to_pandas()
        assert list(zip(out["id_a"], out["id_b"])) == [("a", "b")]


def test_online_lsh_index_matches_batch_candidates(ray_session):
    import ray.data

    from documentai_ray.state.lsh_index import (build_lsh_index,
                                                query_lsh_index,
                                                verify_with_texts)

    base_rows = [{"url": f"u{i}", "text": " ".join(
        f"tok{i}_{j}" for j in range(30))} for i in range(40)]
    # queries: 5 near-dups of indexed docs (one appended token), 5 novel
    q_rows = ([{"url": f"q{i}", "text": base_rows[i]["text"] + " extra"}
               for i in range(5)]
              + [{"url": f"n{i}", "text": " ".join(
                  f"nov{i}_{j}" for j in range(30))} for i in range(5)]
              + [{"url": "empty", "text": ""}])          # shingle-less: skipped
    base = ray.data.from_items(base_rows).repartition(4)
    qs = ray.data.from_items(q_rows).repartition(3)
    shards = build_lsh_index(base, id_col="url", num_shards=3)
    cands = query_lsh_index(qs, shards, id_col="url")
    imap = {r["url"]: r["text"] for r in base_rows}
    qmap = {r["url"]: r["text"] for r in q_rows}
    out = verify_with_texts(cands, qmap, imap, threshold=0.8).to_pandas()
    got = sorted(map(tuple, out[["query_id", "match_id"]].to_numpy()))
    assert got == [(f"q{i}", f"u{i}") for i in range(5)]
    # shard stats confirm the index is actually distributed
    import ray as _ray
    stats = _ray.get([s.stats.remote() for s in shards])
    assert sum(s["n_buckets"] for s in stats) > 0
    assert all(s["n_buckets"] > 0 for s in stats)


def test_online_lsh_index_save_load_roundtrip(ray_session, tmp_path):
    import ray.data

    from documentai_ray.state.lsh_index import (build_lsh_index,
                                                load_lsh_index,
                                                query_lsh_index,
                                                save_lsh_index)

    base_rows = [{"url": f"u{i}", "text": " ".join(
        f"w{i}_{j}" for j in range(25))} for i in range(20)]
    q_rows = [{"url": f"q{i}", "text": base_rows[i]["text"] + " tail"}
              for i in range(6)]
    base = ray.data.from_items(base_rows).repartition(3)
    shards = build_lsh_index(base, id_col="url", num_shards=3)
    save_lsh_index(shards, str(tmp_path / "idx"))
    reloaded = load_lsh_index(str(tmp_path / "idx"))
    qs = ray.data.from_items(q_rows).repartition(2)
    a = query_lsh_index(qs, shards, id_col="url").to_pandas()
    b = query_lsh_index(qs, reloaded, id_col="url").to_pandas()
    key = lambda df: sorted(map(tuple, df.to_numpy()))
    assert key(a) == key(b) and len(a) > 0


class TestPrefixFilterPairs:
    def _brute(self, docs, t=0.8, k=3):
        from documentai_ray.stages.sketches import _shingles
        sets = {i: set(_shingles(txt, k)) for i, txt in docs.items()}
        out = set()
        for a in sets:
            for b in sets:
                if a < b and sets[a] and sets[b]:
                    j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                    if j >= t:
                        out.add((a, b))
        return out

    def test_equals_bruteforce_including_boundary(self, ray_session):
        from documentai_ray.stages.dedup import (prefix_filter_pairs,
                                                 verify_jaccard_pairs)
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = {
            "u1": base,
            "u2": base + " lambda",          # high-overlap near-dup
            "u3": "one two three four five six seven eight nine ten",
            "u4": base.replace("delta", "DELTA"),  # mid-overlap variant
            "u5": "xx yy",                   # < k tokens: no shingles
            "u6": base,                      # exact text dup of u1
        }
        rows = [{"url": u, "text": t} for u, t in docs.items()]
        ds = ray_session.data.from_items(rows).materialize()
        cand = prefix_filter_pairs(ds, id_col="url", threshold=0.8,
                                   num_partitions=4)
        got = {(r["id_a"], r["id_b"])
               for r in verify_jaccard_pairs(
                   ds, cand, threshold=0.8).iter_rows()}
        assert got == self._brute(docs, t=0.8)
        assert ("u1", "u6") in got  # sanity: the exact dup pair survives

    def test_exact_threshold_pair_not_missed(self, ray_session):
        # 8 shingles each, 8 shared of 10 union -> J = 0.8 exactly: the
        # prefix bound must still produce the candidate (>= semantics).
        from documentai_ray.stages.dedup import (prefix_filter_pairs,
                                                 verify_jaccard_pairs)
        a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 wA"     # shingles s1..s8
        b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"     # differs in last token
        ds = ray_session.data.from_items(
            [{"url": "a", "text": a}, {"url": "b", "text": b}]).materialize()
        got = {(r["id_a"], r["id_b"]) for r in verify_jaccard_pairs(
            ds, prefix_filter_pairs(ds, id_col="url", threshold=0.7,
                                    num_partitions=2),
            threshold=0.7).iter_rows()}
        assert got == self._brute({"a": a, "b": b}, t=0.7)
        assert got  # non-vacuous: the boundary pair is present


class TestGroupedCentroid:
    def test_matches_numpy_and_parallelism_invariant(self, ray_session):
        import numpy as np
        from documentai_ray.stages.similarity import grouped_centroid
        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(40, 5)).astype(np.float32)
        labels = (np.arange(40) % 3).astype(np.int64)
        rows = [{"label": int(l), "embedding": v.tolist()}
                for l, v in zip(labels, vecs)]

        def run(nblocks):
            ds = ray_session.data.from_items(rows).repartition(nblocks)
            df = grouped_centroid(ds, key_col="label",
                                  vec_col="embedding").to_pandas()
            return df.sort_values(["label", "dim"]).reset_index(drop=True)

        a, b = run(1), run(8)
        assert (a == b).all().all()          # block-layout invariance
        q = np.rint(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
        for lab in range(3):
            sub = a[a["label"] == lab]
            expect = q[labels == lab].sum(axis=0)
            assert list(sub["sum_q"]) == list(expect)
            assert set(sub["n"]) == {int((labels == lab).sum())}
            assert list(sub["dim"]) == [1, 2, 3, 4, 5]


class TestContainmentPairs:
    def _brute(self, docs, t_ppm=800_000, k=3):
        from documentai_ray.stages.sketches import _shingles
        sets = {i: set(_shingles(txt, k)) for i, txt in docs.items()}
        out = set()
        for a in sets:
            for b in sets:
                if a != b and sets[a]:
                    inter = len(sets[a] & sets[b])
                    if inter * 1_000_000 >= t_ppm * len(sets[a]):
                        out.add((a, b, inter, len(sets[a])))
        return out

    def test_asymmetric_equals_bruteforce(self, ray_session):
        from documentai_ray.stages.dedup import (
            containment_candidate_pairs, verify_containment_pairs)
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = {
            "sub": base,                              # contained in sup
            "sup": base + " extra words wrap around the quoted body "
                   "with much more content following here",
            "other": "one two three four five six seven eight nine",
            "tiny": "xx yy",                          # no shingles
        }
        ds = ray_session.data.from_items(
            [{"url": u, "text": t} for u, t in docs.items()]).materialize()
        cand = containment_candidate_pairs(ds, id_col="url",
                                           threshold_ppm=800_000,
                                           num_partitions=4)
        got = {(r["id_sub"], r["id_super"], r["inter"], r["n_sub"])
               for r in verify_containment_pairs(
                   ds, cand, id_col="url",
                   threshold_ppm=800_000).iter_rows()}
        assert got == self._brute(docs)
        subs = {(a, b) for a, b, _, _ in got}
        assert ("sub", "sup") in subs      # containment found
        assert ("sup", "sub") not in subs  # and it is NOT symmetric


class TestMipsRnnPairs:
    def test_mutual_best_only(self, ray_session):
        import numpy as np
        from documentai_ray.stages.similarity import mips_rnn_pairs
        # 0 and 1 mutually closest; 2's best is 1 but 1's best is 0
        vecs = {0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.5, 0.6],
                3: [-1.0, -1.0]}
        rows = [{"vec_id": i, "embedding": v} for i, v in vecs.items()]
        ds = ray_session.data.from_items(rows).repartition(2)
        out = mips_rnn_pairs(ds).to_pandas()
        got = {(r.id_a, r.id_b) for r in out.itertuples()}
        # brute-force mutual-best under integer-quantized dot
        q = {i: np.rint(np.array(v) * 1e6).astype(np.int64)
             for i, v in vecs.items()}
        def best(i):
            dots = {j: int(q[i] @ q[j]) for j in q if j != i}
            m = max(dots.values())
            return min(j for j, d in dots.items() if d == m)
        brute = {(a, b) for a in q for b in q
                 if a < b and best(a) == b and best(b) == a}
        assert got == brute and got  # non-vacuous


class TestDistributedVerifyPaths:
    """Above-broadcast-limit plans must equal the broadcast plans exactly
    (VERDICT r3 #4: the NotImplementedError guards are now real plans)."""

    def test_containment_distributed_equals_broadcast(self, ray_session):
        from documentai_ray.stages.dedup import (
            containment_candidate_pairs, verify_containment_pairs)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "eta", "theta", "iota", "kappa", "lam", "mu"]
        docs = {}
        for i in range(30):
            body = " ".join(words[j % len(words)]
                            for j in range(i, i + 8))
            docs[f"d{i:02d}"] = body
            docs[f"d{i:02d}_sup"] = body + " trailing context words here"
        ds = ray_session.data.from_items(
            [{"url": u, "text": t} for u, t in docs.items()]).materialize()
        cand = containment_candidate_pairs(
            ds, id_col="url", threshold_ppm=800_000,
            num_partitions=4).materialize()
        key = lambda out: {(r["id_sub"], r["id_super"], r["inter"],
                            r["n_sub"]) for r in out.iter_rows()}
        broad = key(verify_containment_pairs(
            ds, cand, id_col="url", threshold_ppm=800_000,
            broadcast_limit=100_000))
        dist = key(verify_containment_pairs(
            ds, cand, id_col="url", threshold_ppm=800_000,
            broadcast_limit=10))  # forces the two-hash-join plan
        assert dist == broad and broad  # non-vacuous

    def test_mips_rnn_chunked_equals_broadcast(self, ray_session):
        import numpy as np
        from documentai_ray.stages.similarity import mips_rnn_pairs
        rng = np.random.default_rng(7)
        n, d = 60, 8
        rows = [{"vec_id": i,
                 "embedding": rng.normal(size=d).tolist()}
                for i in range(n)]
        ds = ray_session.data.from_items(rows).repartition(4)
        key = lambda df: {(r.id_a, r.id_b, r.dot_ab)
                          for r in df.itertuples()}
        broad = key(mips_rnn_pairs(ds, broadcast_limit=200_000).to_pandas())
        chunked = key(mips_rnn_pairs(ds, broadcast_limit=13).to_pandas())
        assert chunked == broad and broad  # non-vacuous
