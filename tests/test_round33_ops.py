"""Semantics tests for the round-33 keys (coreness, ABC analysis,
recommendation coverage/diversity) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _graph(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    adj = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        c = orders[r.l_orderkey] * 2
        s = r.l_suppkey * 2 + 1
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    return adj


def _true_coreness(adj):
    """Classic peeling: repeatedly remove min-degree nodes."""
    deg = {v: len(ns) for v, ns in adj.items()}
    alive = set(adj)
    core = {}
    k = 0
    while alive:
        k = max(k, min(deg[v] for v in alive))
        peel = [v for v in alive if deg[v] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return core


def test_coreness_matches_hindex_replay_and_converges(spark, sf_dir):
    adj = _graph(spark, sf_dir)
    c = {v: len(ns) for v, ns in adj.items()}
    for _ in range(8):
        nxt = {}
        for v, ns in adj.items():
            vals = sorted((c[u] for u in ns), reverse=True)
            nxt[v] = max(
                min(i + 1, cv) for i, cv in enumerate(vals)
            )
        c = nxt
    census = {}
    for v in c.values():
        census[v] = census.get(v, 0) + 1
    got = {
        r.coreness: r.n_nodes
        for r in QUERIES["graph_coreness"](spark, sf_dir).collect()
    }
    assert got == census
    # ...and 8 rounds have actually converged to true coreness here
    true = _true_coreness(adj)
    true_census = {}
    for v in true.values():
        true_census[v] = true_census.get(v, 0) + 1
    assert got == true_census


def test_abc_analysis_matches_python_replay(spark, sf_dir):
    rev = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        c = math.floor(float(r.l_extendedprice) * 100.0 + 0.5)
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + c
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    stats = {}
    cum = 0
    for part, cents in ranked:
        cum += cents
        cls = "A" if 5 * cum <= 4 * total else (
            "B" if 20 * cum <= 19 * total else "C"
        )
        n, s = stats.get(cls, (0, 0))
        stats[cls] = (n + 1, s + cents)
    rows = {
        r.cls: r
        for r in QUERIES["agg_abc_analysis"](spark, sf_dir).collect()
    }
    assert set(rows) == set(stats)
    for cls, (n, s) in stats.items():
        assert (rows[cls].n_parts, rows[cls].rev_cents) == (n, s)
        assert abs(rows[cls].share - s / total) < 1e-5
    # the Pareto shape: A has the fewest-per-revenue concentration
    assert rows["A"].rev_cents > rows["B"].rev_cents > rows["C"].rev_cents


def test_coverage_diversity_matches_python_replay(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    brand = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    }
    spend = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        cust = orders[r.l_orderkey]
        c = math.floor(float(r.l_extendedprice) * 100.0 + 0.5)
        key = (cust, r.l_partkey)
        spend[key] = spend.get(key, 0) + c
    by_cust = {}
    for (cust, part), cents in spend.items():
        by_cust.setdefault(cust, []).append((-cents, part))
    rec_parts = set()
    ilds = []
    for cust, lst in by_cust.items():
        lst.sort()
        top = [p for _, p in lst[:10]]
        rec_parts.update(top)
        pairs = [
            (top[i], top[j])
            for i in range(len(top))
            for j in range(i + 1, len(top))
        ]
        if not pairs:
            continue
        diff = sum(1 for a, b in pairs if brand[a] != brand[b])
        ilds.append(
            (2000000 * diff + len(pairs)) // (2 * len(pairs))
        )
    row = QUERIES["recs_coverage_diversity"](spark, sf_dir).collect()[0]
    assert row.n_users == len(ilds)
    assert row.n_rec_parts == len(rec_parts)
    assert row.catalog_size == len(brand)
    assert abs(row.coverage - len(rec_parts) / len(brand)) < 1e-6
    assert abs(row.mean_ild - sum(ilds) / (1e6 * len(ilds))) < 1e-5
    assert 0.0 <= row.mean_ild <= 1.0
