"""Semantics tests for the round-15 breadth keys (label propagation,
Markov next-event transitions, Mann–Kendall trend test) — independent
Python re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _edge_list(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    pairs = {
        (orders[r.l_orderkey] * 2, r.l_suppkey * 2 + 1) for r in li
    }
    edges = {}
    for c, s in pairs:
        edges.setdefault(c, []).append(s)
        edges.setdefault(s, []).append(c)
    return edges


def test_label_prop_matches_python_replay(spark, sf_dir):
    """Replay 3 synchronous LPA rounds with the (count DESC, label ASC)
    vote in Python and compare every node's final label + community
    size exactly."""
    edges = _edge_list(spark, sf_dir)
    labels = {n: n for n in edges}
    for _ in range(3):
        new = {}
        for n, nbrs in edges.items():
            votes = {}
            for m in nbrs:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            new[n] = min(
                votes, key=lambda lbl: (-votes[lbl], lbl)
            )
        labels = new
    sizes = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    got = {
        r.node: (r.label, r.comm_size)
        for r in QUERIES["graph_label_prop"](spark, sf_dir).collect()
    }
    want = {n: (labels[n], sizes[labels[n]]) for n in edges}
    assert got == want


def test_label_prop_compresses_labels(spark, sf_dir):
    """After 3 rounds the label space must have collapsed well below
    the node count (communities actually form)."""
    rows = QUERIES["graph_label_prop"](spark, sf_dir).collect()
    assert len({r.label for r in rows}) < len(rows) / 2


def test_covisit_matches_python_replay(spark, sf_dir):
    """Replay per-user consecutive transitions (30-min gap rule,
    (ts, event_id) order) in Python; compare counts, integer
    micro-probabilities, and ranks exactly."""
    by_user = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        by_user.setdefault(r.user_id, []).append(r)
    trans = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            gap = (b.ts - a.ts).total_seconds()
            if gap <= 1800:
                k = (a.event_type, b.event_type)
                trans[k] = trans.get(k, 0) + 1
    totals = {}
    for (cur, _), c in trans.items():
        totals[cur] = totals.get(cur, 0) + c
    ranks = {}
    for cur in totals:
        cands = sorted(
            ((nxt, c) for (c0, nxt), c in trans.items() if c0 == cur),
            key=lambda t: (-t[1], t[0]),
        )
        for i, (nxt, _) in enumerate(cands, start=1):
            ranks[(cur, nxt)] = i
    got = {
        (r.cur, r.nxt): (r.cnt, r.prob_micro, r.rnk)
        for r in QUERIES["recs_covisit_next"](spark, sf_dir).collect()
    }
    want = {
        k: (c, c * 1000000 // totals[k[0]], ranks[k])
        for k, c in trans.items()
    }
    assert got == want


def test_mann_kendall_matches_python_replay(spark, sf_dir):
    """Replay the daily-cents series, the exact S statistic, the
    tie-corrected var18, and the z-score in Python."""
    daily = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        k = (r.event_type, r.ts.date())
        daily[k] = daily.get(k, 0) + math.floor(float(r.value) * 100.0 + 0.5)
    series = {}
    for (et, day), cents in daily.items():
        series.setdefault(et, []).append((day, cents))
    want = {}
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                d = pts[j][1] - pts[i][1]
                s += (d > 0) - (d < 0)
        tie_term = 0
        counts = {}
        for _, c in pts:
            counts[c] = counts.get(c, 0) + 1
        for t in counts.values():
            if t > 1:
                tie_term += t * (t - 1) * (2 * t + 5)
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        sd = math.sqrt(var18 / 18.0)
        z = (s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0
        trend = (
            "increasing"
            if s > 0 and (s - 1) / sd > 1.96
            else "decreasing"
            if s < 0 and (s + 1) / sd < -1.96
            else "no_trend"
        )
        want[et] = (n, s, var18, round(z, 6), trend)
    got = {
        r.event_type: (r.n_days, r.s_stat, r.var18, r.z_score, r.trend)
        for r in QUERIES["ts_mann_kendall"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for et in want:
        assert got[et][:3] == want[et][:3]
        assert abs(got[et][3] - want[et][3]) < 1e-6
        assert got[et][4] == want[et][4]


def test_mann_kendall_formula_detects_monotone_trend():
    """Pure-formula sanity: a strictly increasing series has
    S = n(n-1)/2 and a z far beyond 1.96 for n = 20."""
    n = 20
    s = n * (n - 1) // 2
    var18 = n * (n - 1) * (2 * n + 5)
    z = (s - 1) / math.sqrt(var18 / 18.0)
    assert z > 1.96
