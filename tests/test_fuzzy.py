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
