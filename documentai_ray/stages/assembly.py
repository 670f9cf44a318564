"""Sequence-assembly operators — the de Bruijn graph family
(Pevzner/Idury-Waterman): word-level k-mers of every document become
edges prefix(k-1)-gram -> suffix(k-1)-gram, and the classical
assembly statistics fall out of pure degree arithmetic:

- the Eulerian-path degree condition (Euler 1736 applied to
  k-mer spectra): a path traversing every distinct k-mer once can
  exist only if every node balances in/out degree except at most one
  +1 source and one -1 sink;
- the unitig (maximal non-branching path) START count: every
  distinct edge leaving a branching node (outdeg != 1 or indeg != 1)
  opens a contig.  Isolated simple cycles have no branching node and
  are NOT counted by this formula — the standard, documented caveat
  (counting them exactly needs connectivity, a different op).

Scale contract: the only exchanges are vocabulary-bounded — a
(u, v, multiplicity) edge census (per-batch Counter pre-combine, one
groupby) and a node-degree table derived from it (one more bounded
groupby); documents never shuffle, and every downstream statistic is
an associative Sum/Max over the degree table.  Zero floors anywhere —
the whole family is exact counting.
"""

from __future__ import annotations

import collections

import pandas as pd
import pyarrow as pa


def tokenize(text: str) -> list[str]:
    """Non-empty whitespace split — the quality_pages convention,
    mirrored by list_filter(string_split_regex(text, '\\s+'), ...)."""
    return (text or "").split()


def edge_census(ds, *, text_col: str = "text", k: int = 3):
    """Distinct-edge census of the word k-mer de Bruijn graph:
    one row per distinct (u, v) edge with its corpus multiplicity.
    Per-batch Counter partials pre-combine before the ONE
    vocabulary-bounded exchange."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter()
        for t in batch.column(text_col).to_pylist():
            toks = tokenize(t)
            for i in range(len(toks) - k + 1):
                u = " ".join(toks[i:i + k - 1])
                v = " ".join(toks[i + 1:i + k])
                c[(u, v)] += 1
        return pa.table({
            "u": pa.array([uv[0] for uv in c], pa.large_string()),
            "v": pa.array([uv[1] for uv in c], pa.large_string()),
            "n": pa.array(list(c.values()), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["u", "v"])
              .aggregate(Sum("n", alias_name="n")))


def degree_table(edges):
    """Node degree table from the distinct-edge set: each distinct
    edge contributes outdeg 1 to u and indeg 1 to v (the k-mer
    SPECTRUM view — multiplicities describe coverage, not
    topology).  One bounded exchange on node."""
    from ray.data.aggregate import Sum

    def split(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_pylist()
        v = batch.column("v").to_pylist()
        return pa.table({
            "node": pa.array(u + v, pa.large_string()),
            "outd": pa.array([1] * len(u) + [0] * len(v),
                             pa.int64()),
            "ind": pa.array([0] * len(u) + [1] * len(v),
                            pa.int64())})

    return (edges.map_batches(split, batch_format="pyarrow")
                 .groupby("node")
                 .aggregate(Sum("outd", alias_name="outd"),
                            Sum("ind", alias_name="ind")))


def imbalance_histogram(deg) -> "object":
    """(outdeg - indeg) -> node count; the global sum of imbalances
    is 0 by construction (every edge grants one out and one in)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["imbalance"] = df["outd"] - df["ind"]
        g = (df.groupby("imbalance", as_index=False).size()
             .rename(columns={"size": "n_nodes"}))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    return (deg.map_batches(partial, batch_format="pyarrow")
               .groupby("imbalance")
               .aggregate(Sum("n_nodes", alias_name="n_nodes")))


def assembly_stats(edges, deg) -> pd.DataFrame:
    """One-row assembly summary — every statistic an associative
    aggregate over the bounded edge/degree tables:

      n_nodes, n_edges (distinct), kmer_occurrences (multiplicity
      sum), n_branching (outdeg != 1 or indeg != 1),
      n_contig_starts (distinct edges leaving branching nodes),
      euler_path_ok (degree condition: no |imbalance| > 1, at most
      one +1 — the matching -1 count then follows since imbalances
      sum to zero)."""
    from ray.data.aggregate import Count, Sum

    e = edges.aggregate(Count(alias_name="ne"),
                        Sum("n", alias_name="occ"))
    # Sum over an empty dataset reports None — an empty graph is a
    # legal corpus (every document shorter than k tokens)
    n_edges = int(e["ne"] or 0)
    occurrences = int(e["occ"] or 0)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        imb = df["outd"] - df["ind"]
        branching = (df["outd"] != 1) | (df["ind"] != 1)
        return pa.table({
            "nn": [len(df)],
            "nb": [int(branching.sum())],
            "cs": [int(df.loc[branching, "outd"].sum())],
            "p1": [int((imb == 1).sum())],
            "big": [int((imb.abs() > 1).sum())]})

    s = (deg.map_batches(partial, batch_format="pyarrow")
         .aggregate(Sum("nn", alias_name="nn"),
                    Sum("nb", alias_name="nb"),
                    Sum("cs", alias_name="cs"),
                    Sum("p1", alias_name="p1"),
                    Sum("big", alias_name="big")))
    out = pd.DataFrame({
        "n_nodes": [int(s["nn"] or 0)],
        "n_edges": [n_edges],
        "kmer_occurrences": [occurrences],
        "n_branching": [int(s["nb"] or 0)],
        "n_contig_starts": [int(s["cs"] or 0)],
        "euler_path_ok": [bool((s["big"] or 0) == 0
                               and (s["p1"] or 0) <= 1)]})
    for c in out.columns:
        if c != "euler_path_ok":
            out[c] = out[c].astype("int64")
    return out
