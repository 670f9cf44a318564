"""Language-ID, token counting, fingerprinting tests."""

from __future__ import annotations

from documentai_ray.stages import textstats


class TestLangId:
    def test_real_sentences(self):
        cases = {
            "the quick brown fox is in the garden and it is happy": "en",
            "der Hund ist nicht in dem Haus und die Katze ist auf dem Dach": "de",
            "le chat est dans la maison et les enfants sont dans le jardin": "fr",
            "el perro es grande y la casa es bonita en la ciudad": "es",
        }
        for text, want in cases.items():
            got, conf = textstats.lang_id(text)
            assert got == want, text
            assert conf > 0.2

    def test_undetermined(self):
        assert textstats.lang_id("")[0] == "und"
        assert textstats.lang_id("zzz qqq 123")[0] == "und"


class TestTokenCounting:
    def test_ws_tokens(self):
        assert textstats.count_ws_tokens("a b  c\nd") == 4
        assert textstats.count_ws_tokens("") == 0

    def test_bpe_ish_tokens(self):
        # contraction split + punctuation runs + numbers
        n = textstats.count_bpe_tokens("it's 2024, really!")
        # it + 's + " 2024" + "," + " really" + "!"
        assert n == 6

    def test_batch(self):
        import pyarrow as pa

        t = pa.table({"text": ["one two", ""]})
        out = textstats.token_count_batch(t)
        assert out.column("n_ws_tokens").to_pylist() == [2, 0]


class TestFingerprint:
    def test_deterministic_and_discriminative(self):
        a = " ".join(f"tok{i}" for i in range(64))
        b = " ".join(f"tok{i}" for i in range(64, 128))
        assert textstats.fingerprint(a) == textstats.fingerprint(a)
        assert textstats.fingerprint(a) != textstats.fingerprint(b)
        assert textstats.fingerprint("") == 0

    def test_short_text_path(self):
        assert textstats.fingerprint("one two") == textstats.fingerprint("one two")
        assert textstats.fingerprint("one two") != textstats.fingerprint("two one")

    def test_local_perturbation_keeps_most_anchors(self):
        base = " ".join(f"w{i}" for i in range(200))
        mutated = base + " extra"
        # winnowing-style anchors: a suffix edit must not change the
        # fingerprint into something with no shared anchor structure —
        # both fingerprints are XORs over window hashes, sharing most terms
        fa, fb = textstats.fingerprint(base), textstats.fingerprint(mutated)
        assert fa != 0 and fb != 0


class TestCharNgramFallback:
    def test_german_compounds_without_stopwords(self):
        got, conf = textstats.lang_id("Schifffahrtsgesellschaft Versicherungsschutz Entschuldigung")
        assert got == "de" and conf > 0

    def test_spanish_suffixes(self):
        got, _ = textstats.lang_id("canción investigación organización")
        assert got == "es"

    def test_stopwords_take_priority(self):
        # text with English stopwords but German-looking trigrams
        got, _ = textstats.lang_id("the schnitzel and the sauerkraut of the haus")
        assert got == "en"


def test_bigram_lm_fit_and_score(ray_session):
    import ray.data
    import pyarrow as pa

    from documentai_ray.stages.textstats import (bigram_score_batch,
                                                 fit_bigram_counts)

    t = pa.table({"text": pa.array(["a b a b", "a b c"], pa.large_string())})
    uni, bi = fit_bigram_counts(ray.data.from_arrow(t))
    assert uni == {"a": 3, "b": 3, "c": 1}
    assert bi == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    out = bigram_score_batch(t, uni, bi)
    # doc 0: bigrams ab,ba,ab -> floor(3e6/3)+floor(1e6/3)+floor(3e6/3)
    #        = 1000000+333333+1000000 = 2333333; //3 = 777777
    assert out.column("lm_score_ppm").to_pylist()[0] == 777777
    # doc 1: ab,bc -> 1000000 + 333333 = 1333333 // 2 = 666666
    assert out.column("lm_score_ppm").to_pylist()[1] == 666666


class TestVocabGrowth:
    def _docs(self, spec):
        return [{"doc_id": i, "text": t} for i, t in spec]

    def test_hand_computed_curve(self, ray_session):
        """min-ids a:1 b:1 c:2 d:5 -> vocab at doubling prefixes
        0,2,3,4; doc prefixes 0,1,2,3."""
        from documentai_ray.stages.textstats import vocab_growth
        ds = ray_session.data.from_items(
            self._docs([(1, "a b"), (2, "b c"), (5, "d")])).repartition(2)
        out = vocab_growth(ds).to_pandas()
        assert list(out["k"]) == [0, 1, 2, 3]
        assert list(out["prefix_docs"]) == [0, 1, 2, 3]
        assert list(out["vocab"]) == [0, 2, 3, 4]

    def test_doc_id_zero_and_empty_tokens(self, ray_session):
        """id 0 lands in the k=0 prefix (id < 1); consecutive spaces
        emit no empty token."""
        from documentai_ray.stages.textstats import vocab_growth
        ds = ray_session.data.from_items(
            self._docs([(0, "z  z"), (1, "")]))
        out = vocab_growth(ds).to_pandas()
        assert list(out["k"]) == [0, 1]
        assert list(out["prefix_docs"]) == [1, 2]
        assert list(out["vocab"]) == [1, 1]

    def test_first_occurrence_not_count(self, ray_session):
        """A token repeated in a LATER doc does not grow the curve --
        membership is by first occurrence only."""
        from documentai_ray.stages.textstats import vocab_growth
        ds = ray_session.data.from_items(
            self._docs([(1, "w"), (4, "w w w")])).repartition(2)
        out = vocab_growth(ds).to_pandas()
        assert list(out["vocab"]) == [0, 1, 1, 1]


class TestReadability:
    def _score(self, ray_session, text):
        from documentai_ray.stages.textstats import readability_batch
        ds = ray_session.data.from_items([{"doc_id": 1, "text": text}])
        return (ds.map_batches(readability_batch, batch_format="pyarrow")
                .to_pandas().iloc[0])

    def test_simple_prose(self, ray_session):
        """6 words / 2 sentences / 6 vowel groups -> 119.19 Flesch."""
        r = self._score(ray_session, "The cat sat. The dog ran.")
        assert (r["n_words"], r["n_sents"], r["n_syll"]) == (6, 2, 6)
        assert r["flesch_ppm"] == 119_190_000

    def test_clamps(self, ray_session):
        """Empty text clamps every count to 1; a vowel-free word
        clamps syllables up to the word count."""
        r = self._score(ray_session, "")
        assert (r["n_words"], r["n_sents"], r["n_syll"]) == (1, 1, 1)
        assert r["flesch_ppm"] == 206_835_000 - 1_015_000 - 84_600_000
        r2 = self._score(ray_session, "tsktsk.")
        assert (r2["n_words"], r2["n_syll"]) == (1, 1)

    def test_harder_text_scores_lower(self, ray_session):
        """A long multisyllabic single sentence scores far below
        simple two-sentence prose."""
        easy = self._score(ray_session, "The cat sat. The dog ran.")
        hard = self._score(
            ray_session,
            "Notwithstanding considerable organizational heterogeneity "
            "the international standardization community deliberately "
            "prioritized interoperability over implementation")
        assert hard["flesch_ppm"] < easy["flesch_ppm"]
