"""Semantics tests for the round-25 breadth keys (random walks,
decision stump, n-gram novelty) — independent Python re-derivations,
not oracle re-runs."""

from __future__ import annotations

import hashlib
import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _adj(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    pairs = {(orders[r.l_orderkey] * 2, r.l_suppkey * 2 + 1) for r in li}
    adj = {}
    for c, s in pairs:
        adj.setdefault(c, []).append(s)
        adj.setdefault(s, []).append(c)
    for v in adj.values():
        v.sort()
    return adj


def test_random_walk_matches_python_replay(spark, sf_dir):
    """Replay the md5-ranked neighbor picks for every seed and step."""
    adj = _adj(spark, sf_dir)
    seeds = sorted(n for n in adj if n % 2 == 0 and n // 2 <= 20)
    want = set()
    for s0 in seeds:
        node = s0
        want.add((s0, 0, node))
        for step in (1, 2, 3):
            h = int(
                hashlib.md5(f"{node}#{step}".encode()).hexdigest()[:15], 16
            )
            node = adj[node][h % len(adj[node])]
            want.add((s0, step, node))
    got = {
        (r.start_node, r.step, r.node)
        for r in QUERIES["graph_random_walk"](spark, sf_dir).collect()
    }
    assert got == want


def test_random_walk_alternates_bipartite_sides(spark, sf_dir):
    """On the bipartite graph every step must flip node parity."""
    rows = QUERIES["graph_random_walk"](spark, sf_dir).collect()
    for r in rows:
        assert (r.node % 2) == (r.step % 2)


def test_decision_stump_matches_python_replay(spark, sf_dir):
    """Replay prefix-sum split finding and the micro-rounded argmin."""
    pts = []
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        pts.append(
            (
                math.floor(float(r.value) * 100.0 + 0.5),
                1 if r.event_type == "purchase" else 0,
            )
        )
    n = len(pts)
    p = sum(y for _, y in pts)
    lvl = {}
    for x, y in pts:
        c, q = lvl.get(x, (0, 0))
        lvl[x] = (c + 1, q + y)
    best = None
    n_l = p_l = 0
    for x in sorted(lvl):
        c, q = lvl[x]
        n_l += c
        p_l += q
        if n_l >= n:
            continue
        n_r, p_r = n - n_l, p - p_l
        g = math.floor(
            2000000.0 / n * (p_l * (n_l - p_l) / n_l + p_r * (n_r - p_r) / n_r)
            + 0.5
        )
        cand = (g, x, n_l, p_l, n_r, p_r)
        if best is None or cand[:2] < best[:2]:
            best = cand
    (row,) = QUERIES["ml_decision_stump"](spark, sf_dir).collect()
    g, x, n_l, p_l, n_r, p_r = best
    assert (
        row.threshold,
        row.n_left,
        row.pos_left,
        row.n_right,
        row.pos_right,
        row.gini_micro,
    ) == (x, n_l, p_l, n_r, p_r, g)


def test_stump_split_beats_no_split(spark, sf_dir):
    """The chosen split's weighted impurity never exceeds the root
    Gini (splitting can only help or tie)."""
    pts = []
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        pts.append(1 if r.event_type == "purchase" else 0)
    n, p = len(pts), sum(pts)
    root = 2 * p * (n - p) / (n * n)
    (row,) = QUERIES["ml_decision_stump"](spark, sf_dir).collect()
    assert row.gini_micro <= math.floor(root * 1e6 + 0.5) + 1


def test_ngram_novelty_matches_python_replay(spark, sf_dir):
    """Replay trigram extraction, first-seen periods, and the novelty
    fold; the first period is 100% novel by construction."""
    tris = []
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks = d.text.split(" ")
        period = d.doc_id // 100
        for i in range(len(toks) - 2):
            tris.append((period, " ".join(toks[i : i + 3])))
    first = {}
    for period, t in tris:
        if t not in first or period < first[t]:
            first[t] = period
    per = {}
    for period, t in tris:
        seen, new = per.get(period, (set(), set()))
        seen.add(t)
        if first[t] == period:
            new.add(t)
        per[period] = (seen, new)
    got = {
        r.period: (r.types_seen, r.new_types, r.novelty_micro, r.vocab_cum)
        for r in QUERIES["text_ngram_novelty"](spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    cum = 0
    for period in sorted(per):
        seen, new = per[period]
        cum += len(new)
        assert got[period] == (
            len(seen),
            len(new),
            len(new) * 1000000 // len(seen),
            cum,
        )
    assert got[min(per)][2] == 1000000  # period 0 is all-novel
