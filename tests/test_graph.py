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


def test_wcc_matches_union_find(spark, sf_dir):
    """Component census equals a driver-side union-find over the same
    filtered edge list, and no component spans two nations (the blocking
    invariant the oracle's closure-size bound depends on)."""
    from pyspark.sql import functions as F

    from hh_rumors_presto_spark import io
    from hh_rumors_presto_spark.queries.graph import graph_wcc

    li = io.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = io.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = io.load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
            F.col("c_nationkey").alias("nation"),
        )
        .count()
        .filter(F.col("count") >= 2)
        .collect()
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    node_nation: dict[int, set] = {}
    for r in pairs:
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
        node_nation.setdefault(r.a, set()).add(r.nation)
        node_nation.setdefault(r.b, set()).add(r.nation)

    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {
        min(members): (
            len(members),
            sum(1 for m in members if m % 2 == 0),
            sum(1 for m in members if m % 2 == 1),
        )
        for members in comps.values()
    }
    got = {
        r.component: (r.n_nodes, r.n_customers, r.n_suppliers)
        for r in graph_wcc(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 1, "degenerate: the whole graph is one component"
    # blocking invariant: every component's nodes share one nation
    for members in comps.values():
        nations = set()
        for m in members:
            nations |= node_nation[m]
        assert len(nations) == 1
