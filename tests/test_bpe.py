"""BPE training + encoding (stages/bpe.py).

Pins the semantics the SQL oracles mirror: left-to-right non-overlapping
merge passes, overlap-inclusive pair counts, (n desc, lhs, rhs) tie-break,
and in-training-order encoding ≡ rank-based encoding for self-trained
merge lists.
"""

from __future__ import annotations

import pyarrow as pa

from documentai_ray.stages.bpe import (
    BpeEncodeStage,
    PRETRAINED_MERGES,
    bpe_train,
    bpe_train_distributed,
    encode_word,
    merge_syms,
    word_freq_partial,
)


class TestMergePass:
    def test_left_to_right_non_overlapping(self):
        assert merge_syms(("a", "a", "a"), "a", "a") == ("aa", "a")
        assert merge_syms(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")

    def test_whole_symbol_only(self):
        # (b, c) must not fire inside the symbol "ab" + "c" boundary
        assert merge_syms(("ab", "c"), "b", "c") == ("ab", "c")
        assert merge_syms(("a", "bc"), "a", "b") == ("a", "bc")


class TestTrain:
    def test_hand_computed_merges(self):
        # banana: (a,n)=6=(n,a); tie-break lex → (a,n); then aaa's (a,a)=4;
        # then three-way tie at 3 → lex min ('an','a')
        merges = bpe_train({"banana": 3, "aaa": 2}, 3)
        assert merges == [("a", "n", 6), ("a", "a", 4), ("an", "a", 3)]

    def test_stops_when_no_pairs(self):
        assert bpe_train({"a": 5, "b": 2}, 4) == []

    def test_chained_merges_build_long_symbols(self):
        merges = bpe_train({"tabletable": 10}, 9)
        final = encode_word("tabletable", [(l, r) for l, r, _ in merges])
        assert final == ("tabletable",)


class TestEncode:
    def _rank_based(self, word, merges):
        """Reference encoder: repeatedly merge the best-ranked pair present
        (the GPT-2/Sennrich formulation)."""
        rank = {(l, r): i for i, (l, r) in enumerate(merges)}
        syms = tuple(word)
        while len(syms) >= 2:
            pairs = [(rank[p], p) for p in zip(syms, syms[1:]) if p in rank]
            if not pairs:
                break
            _, (l, r) = min(pairs)
            syms = merge_syms(syms, l, r)
        return syms

    def test_in_order_equals_rank_based_on_trained_list(self):
        vocab = {"table": 9, "batch": 7, "scan": 6, "banana": 5,
                 "row": 4, "order": 3, "aaa": 2, "inner": 2}
        merges = [(l, r) for l, r, _ in bpe_train(vocab, 12)]
        for w in list(vocab) + ["tablebatch", "scanner", "zzz", "a", ""]:
            assert encode_word(w, merges) == self._rank_based(w, merges), w

    def test_pretrained_chain(self):
        m = [(l, r) for l, r in PRETRAINED_MERGES]
        assert encode_word("table", m) == ("table",)
        assert encode_word("scanner", m) == ("scan", "n", "er")
        assert encode_word("x", m) == ("x",)

    def test_stage_counts_and_cache(self):
        batch = pa.table({
            "doc_id": [1, 2, 3],
            "text": ["table table scanner", "", "row  row"],  # double space
        })
        out = BpeEncodeStage()(batch)
        # table=1 tok ×2 + scanner=3 → 5; empty → 0; row=1 ×2 (empty word
        # between the two spaces contributes nothing) → 2
        assert out.column("n_bpe_tokens").to_pylist() == [5, 0, 2]

    def test_stage_token_stream(self):
        batch = pa.table({"doc_id": [1], "text": ["scanner table"]})
        out = BpeEncodeStage(emit_tokens=True)(batch)
        assert out.column("bpe_tokens").to_pylist() == ["scan n er table"]


class TestDistributed:
    def test_word_freq_partial(self):
        t = pa.table({"text": ["a b a", "", "b  c"]})
        out = word_freq_partial(t)
        got = dict(zip(out.column("word").to_pylist(),
                       out.column("n").to_pylist()))
        assert got == {"a": 2, "b": 2, "c": 1}

    def test_distributed_matches_driver(self, ray_session):
        import ray.data

        texts = ["banana banana aaa", "banana", "aaa aaa"]
        ds = ray.data.from_items([{"text": t} for t in texts])
        got = bpe_train_distributed(ds, num_merges=3)
        want = bpe_train({"banana": 3, "aaa": 3}, 3)
        assert got == want

    def test_min_freq_prunes(self, ray_session):
        import ray.data

        ds = ray.data.from_items(
            [{"text": "banana banana rare"}])
        got = bpe_train_distributed(ds, num_merges=1, min_freq=2)
        assert got == bpe_train({"banana": 2}, 1)

    def test_vocab_contract_raises(self, ray_session):
        import pytest
        import ray.data

        ds = ray.data.from_items([{"text": "a b c d e"}])
        with pytest.raises(ValueError, match="max_vocab_rows"):
            bpe_train_distributed(ds, num_merges=1, max_vocab_rows=2)


class TestProperties:
    """Hypothesis fuzz for the two equivalence claims the SQL oracles
    lean on (see stages/bpe.py module docstring)."""

    def test_in_order_equals_rank_based_fuzz(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        word = st.text(alphabet="abc", min_size=0, max_size=12)

        @settings(max_examples=150, deadline=None)
        @given(st.lists(word, min_size=1, max_size=8), word)
        def check(vocab_words, probe):
            vocab = {w: i + 1 for i, w in enumerate(vocab_words) if w}
            if not vocab:
                return
            merges = [(l, r) for l, r, _ in bpe_train(vocab, 6)]
            ref = TestEncode()._rank_based
            for w in list(vocab) + [probe]:
                assert encode_word(w, merges) == ref(w, merges)

        check()

    def test_merge_pass_equals_sentinel_replace_fuzz(self):
        """merge_syms == the oracle's string replace over the
        chr(31)sym chr(30) sentinel encoding, including overlap and
        whole-symbol boundary cases."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        sym = st.text(alphabet="ab", min_size=1, max_size=3)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(sym, min_size=0, max_size=8), sym, sym)
        def check(syms, lhs, rhs):
            s = " ".join(f"\x1f{x}\x1e" for x in syms)
            pat = f"\x1f{lhs}\x1e \x1f{rhs}\x1e"
            rep = f"\x1f{lhs}{rhs}\x1e"
            via_replace = tuple(
                t[1:-1] for t in s.replace(pat, rep).split(" ") if t)
            assert via_replace == merge_syms(tuple(syms), lhs, rhs)

        check()
