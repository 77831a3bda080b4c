"""Graph batch: fixed-point PageRank / degree / BFS invariants.

Cross-engine value equality is covered by the DuckDB oracles
(tools/verify_local.py); these tests pin the algorithmic invariants that
an oracle comparison alone would not localize.
"""

from __future__ import annotations

from hh_rumors_presto_spark.queries.graph import (
    _SCALE,
    graph_bfs,
    graph_pagerank,
)


def test_pagerank_deterministic_and_mass_bounded(spark, sf_dir):
    rows1 = graph_pagerank(spark, sf_dir).collect()
    rows2 = graph_pagerank(spark, sf_dir).collect()
    assert rows1 == rows2  # bit-identical across runs (fixed-point ints)
    assert len(rows1) > 0
    # truncating division only loses mass: every rank is positive and the
    # top-100 total never exceeds the full fixed-point mass
    assert all(r.rank_fp > 0 for r in rows1)
    assert sum(r.rank_fp for r in rows1) <= _SCALE
    # descending rank with node tiebreak
    keys = [(-r.rank_fp, r.node) for r in rows1]
    assert keys == sorted(keys)


def test_bfs_levels_partition_nodes(spark, sf_dir):
    rows = graph_bfs(spark, sf_dir).collect()
    seen = [r.node for r in rows]
    assert len(seen) == len(set(seen))  # each node exactly one level
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r.node)
    assert set(by_level) <= {0, 1, 2, 3}
    # bipartite parity: even (customer) seeds -> odd suppliers at level 1,
    # even customers at level 2, odd at level 3
    assert all(n % 2 == 0 for n in by_level.get(0, []))
    assert all(n % 2 == 1 for n in by_level.get(1, []))
    assert all(n % 2 == 0 for n in by_level.get(2, []))
    assert all(n % 2 == 1 for n in by_level.get(3, []))


def test_triangles_match_bruteforce(spark, sf_dir):
    """Per-node triangle counts equal a brute-force enumeration over the
    collected pair list (each canonical triple a<b<c counted once)."""
    from hh_rumors_presto_spark.queries.extensions_dedup import dedup_ngram_jaccard
    from hh_rumors_presto_spark.queries.graph import graph_triangles

    edges = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for a, b in edges:
        common = adj[a] & adj[b]
        for c in common:
            if a < b < c:
                for n in (a, b, c):
                    expect[n] = expect.get(n, 0) + 1
    got = {r.doc_id: r.n_tri for r in graph_triangles(spark, sf_dir).collect()}
    assert got == expect
