"""Edit-distance fuzzy join (stages/fuzzy.py): levenshtein parity with
DuckDB, vocabulary argmin/tie-break semantics, and the distinct-project →
broadcast-lookup join."""
import duckdb
import pyarrow as pa

from documentai_ray.stages.fuzzy import (fuzzy_match_join, levenshtein,
                                         match_vocabulary)


def test_levenshtein_matches_duckdb():
    cases = [("kitten", "sitting"), ("", ""), ("", "abc"), ("abc", ""),
             ("abc", "abc"), ("flaw", "lawn"), ("gumbo", "gambol"),
             ("src.example.com", "src0.example.com"),
             ("heavy.exmple.com", "heavy.example.com"),
             ("aaaa", "bbbb"), ("ab", "ba"), ("intention", "execution")]
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_match_vocabulary_tiebreak_and_cutoff():
    # 'src.x' is distance 1 from both 'src0.x' and 'src1.x' -> lexicographic
    m = match_vocabulary(["src.x", "zzzzzz"], ["src1.x", "src0.x"],
                         max_dist=2)
    assert m["src.x"] == ("src0.x", 1)
    assert "zzzzzz" not in m  # beyond max_dist -> dropped


def test_fuzzy_match_join_end_to_end(ray_session):
    import ray.data

    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "s": pa.array(["appl", "banana", "cherr", "xqzw"],
                                pa.string())})
    out = fuzzy_match_join(ray.data.from_arrow(t), col="s",
                           canon=["apple", "banana", "cherry"],
                           max_dist=1, num_partitions=4).to_pandas()
    got = {r.id: (r.canon, r.dist) for r in out.itertuples()}
    assert got == {1: ("apple", 1), 2: ("banana", 0), 3: ("cherry", 1)}


class TestSymspellJoin:
    def _brute(self, lefts, rights):
        from documentai_ray.stages.fuzzy import levenshtein
        return {(a, b, levenshtein(a, b)) for a in set(lefts)
                for b in set(rights) if levenshtein(a, b) <= 1}

    def test_equals_bruteforce_all_edit_kinds(self, ray_session):
        from documentai_ray.stages.fuzzy import symspell_join
        lefts = ["kitten", "kitte", "kittten", "mitten", "xyz",
                 "kitten", ""]          # dup row + empty string
        rights = ["kitten", "sitting", "mitten", "k", ""]
        out = symspell_join(
            ray_session.data.from_items([{"a": v} for v in lefts]),
            ray_session.data.from_items([{"b": v} for v in rights]),
            left_col="a", right_col="b", num_partitions=4,
        ).to_pandas()
        got = {(r.a, r.b, r.dist) for r in out.itertuples()}
        assert got == self._brute(lefts, rights)
        # the three edit kinds all present: exact, deletion, insertion,
        # substitution
        assert ("kitten", "kitten", 0) in got
        assert ("kitte", "kitten", 1) in got      # insertion into left
        assert ("kittten", "kitten", 1) in got    # deletion from left
        assert ("mitten", "kitten", 1) in got     # substitution
        # distance-2 shared-variant candidates must be verified away
        assert all(d <= 1 for _, _, d in got)

    def test_pair_deduped_across_shared_variants(self, ray_session):
        # "ab" vs "ab": shares MANY variants (ab, a, b) -> exactly one row
        from documentai_ray.stages.fuzzy import symspell_join
        out = symspell_join(
            ray_session.data.from_items([{"a": "ab"}, {"a": "ab"}]),
            ray_session.data.from_items([{"b": "ab"}]),
            left_col="a", right_col="b", num_partitions=3,
        ).to_pandas()
        assert len(out) == 1 and out.iloc[0]["dist"] == 0

    def test_same_column_name_rejected(self, ray_session):
        import pytest
        from documentai_ray.stages.fuzzy import symspell_join
        ds = ray_session.data.from_items([{"v": "x"}])
        with pytest.raises(ValueError):
            symspell_join(ds, ds, left_col="v", right_col="v")


class TestSoundex:
    def test_known_codes(self):
        from documentai_ray.stages.fuzzy import soundex
        assert soundex("Robert") == soundex("Rupert") == "R163"
        assert soundex("Smith") == soundex("Smyth") == "S530"
        assert soundex("PFISTER") == "P236"  # 2nd letter merges into 1st run
        assert soundex("Tymczak") == "T522"  # vowel separates equal classes
        assert soundex("Honeyman") == "H555"
        assert soundex("") == "" and soundex("123") == ""

    def test_blocking_census(self, ray_session):
        """Smith x2 and Smyth share S530 (2 names, 3 rows); Robert is
        alone in R163."""
        from documentai_ray.stages.fuzzy import soundex_blocking
        ds = ray_session.data.from_items(
            [{"n": x} for x in ["Smith", "Smith", "Smyth", "Robert"]]
        ).repartition(2)
        out = (soundex_blocking(ds, col="n").to_pandas()
               .set_index("code"))
        assert (out.loc["S530", "n_names"],
                out.loc["S530", "n_rows"]) == (2, 3)
        assert (out.loc["R163", "n_names"],
                out.loc["R163", "n_rows"]) == (1, 1)
