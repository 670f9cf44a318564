"""De Bruijn assembly kernels: a linear document is its own
Eulerian path (+1/0/-1 degree profile, one contig start), a pure
cycle has no branching node, a shared-prefix fork doubles the contig
starts, multiplicity counts coverage without changing topology, and
imbalances always sum to zero."""

from __future__ import annotations

import pyarrow as pa

from documentai_ray.stages.assembly import (
    assembly_stats,
    degree_table,
    edge_census,
    imbalance_histogram,
)


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())}))


def _run(texts):
    edges = edge_census(_ds(texts)).materialize()
    deg = degree_table(edges)
    hist = imbalance_histogram(deg).to_pandas()
    stats = assembly_stats(edges, degree_table(edges))
    return hist, stats


class TestLinearPath:
    def test_single_doc_is_its_own_eulerian_path(self, ray_session):
        hist, stats = _run(["a b c d"])
        h = dict(zip(hist["imbalance"], hist["n_nodes"]))
        # nodes: 'a b'(+1), 'b c'(0), 'c d'(-1)
        assert h == {1: 1, 0: 1, -1: 1}
        row = stats.iloc[0]
        assert row["n_nodes"] == 3 and row["n_edges"] == 2
        assert row["kmer_occurrences"] == 2
        # 'a b' (in 0) and 'c d' (out 0) are branching endpoints;
        # one contig starts at 'a b'
        assert row["n_branching"] == 2
        assert row["n_contig_starts"] == 1
        assert bool(row["euler_path_ok"])


class TestCycle:
    def test_pure_cycle_no_branching(self, ray_session):
        """'a b a b a' -> edges ab->ba, ba->ab: both balanced, a
        degree-condition pass with zero +-1 nodes, zero branching
        nodes — and zero contig starts (the documented cycle
        caveat)."""
        hist, stats = _run(["a b a b a"])
        h = dict(zip(hist["imbalance"], hist["n_nodes"]))
        assert h == {0: 2}
        row = stats.iloc[0]
        assert row["n_edges"] == 2
        assert row["kmer_occurrences"] == 3  # coverage > topology
        assert row["n_branching"] == 0
        assert row["n_contig_starts"] == 0
        assert bool(row["euler_path_ok"])


class TestFork:
    def test_shared_prefix_fork_two_starts(self, ray_session):
        """'a b c' and 'a b d': node 'a b' has outdeg 2 — branching
        — so TWO contigs start there; with 4 unbalanced nodes the
        Euler degree condition fails."""
        hist, stats = _run(["a b c", "a b d"])
        row = stats.iloc[0]
        assert row["n_edges"] == 2
        assert row["n_contig_starts"] == 2
        assert not bool(row["euler_path_ok"])

    def test_duplicate_kmers_collapse_in_spectrum(self, ray_session):
        """The same document twice: identical spectrum, doubled
        coverage."""
        _, once = _run(["x y z w"])
        _, twice = _run(["x y z w", "x y z w"])
        assert twice.iloc[0]["n_edges"] == once.iloc[0]["n_edges"]
        assert (twice.iloc[0]["kmer_occurrences"]
                == 2 * once.iloc[0]["kmer_occurrences"])
        assert (twice.iloc[0]["n_contig_starts"]
                == once.iloc[0]["n_contig_starts"])


class TestInvariants:
    def test_imbalances_sum_to_zero(self, ray_session):
        hist, _ = _run(["a b c d", "c d e", "q r q r", "a b x"])
        assert int((hist["imbalance"] * hist["n_nodes"]).sum()) == 0

    def test_short_docs_emit_nothing(self, ray_session):
        """Fewer than k tokens -> no k-mer, no edge, no node."""
        hist, stats = _run(["a b", "x", ""])
        assert len(hist) == 0
        assert stats.iloc[0]["n_nodes"] == 0
        assert stats.iloc[0]["n_edges"] == 0
