"""Semantics tests for the round-43 keys (session depth, IN-list
pushdown, McNemar) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_session_depth_matches_python_replay(spark, sf_dir):
    ev = sorted(
        (
            (r.user_id, int(r.ts.timestamp() * 1e6), r.event_id)
            for r in io.load_events(spark, sf_dir).collect()
        )
    )
    by_user = {}
    for u, ts, eid in ev:
        by_user.setdefault(u, []).append((ts, eid))
    gap = 30 * 60 * 1_000_000
    hist = {}
    total = 0
    for rows in by_user.values():
        rows.sort()
        depth = 0
        prev = None
        for ts, _ in rows:
            if prev is None or ts - prev > gap:
                if depth:
                    hist[depth] = hist.get(depth, 0) + 1
                    total += 1
                depth = 0
            depth += 1
            prev = ts
        hist[depth] = hist.get(depth, 0) + 1
        total += 1
    got = {
        r.depth: (r.n_sessions, r.share_micro)
        for r in QUERIES["agg_session_depth"](spark, sf_dir).collect()
    }
    assert {d: n for d, (n, _) in got.items()} == hist
    for d, (n, share) in got.items():
        assert share == (2000000 * n + total) // (2 * total)
    # shares form a distribution
    assert abs(sum(s for _, s in got.values()) / 1e6 - 1.0) < 1e-3


def test_pushdown_in_matches_and_pushes(spark, sf_dir):
    counts, users = {}, {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type in ("view", "click"):
            counts[r.event_type] = counts.get(r.event_type, 0) + 1
            users.setdefault(r.event_type, set()).add(r.user_id)
    df = QUERIES["scan_pushdown_in"](spark, sf_dir)
    got = {r.event_type: (r.n, r.n_users) for r in df.collect()}
    assert got == {
        t: (counts[t], len(users[t])) for t in counts
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "In(event_type" in pushed


def _router(cents, cuts):
    labels = ("view", "click", "signup", "purchase")
    for cut, lbl in zip(cuts, labels):
        if cents < cut:
            return lbl
    return "error"


def test_mcnemar_matches_python_replay(spark, sf_dir):
    n11 = b = c = n00 = 0
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        cents = math.floor(float(r.value) * 100.0 + 0.5)
        a_ok = _router(cents, (2000, 4000, 6000, 8000)) == r.event_type
        b_ok = _router(cents, (1500, 3500, 5500, 7500)) == r.event_type
        if a_ok and b_ok:
            n11 += 1
        elif a_ok:
            b += 1
        elif b_ok:
            c += 1
        else:
            n00 += 1
    row = QUERIES["eval_mcnemar"](spark, sf_dir).collect()[0]
    assert (row.both_right, row.a_only, row.b_only, row.both_wrong) == (
        n11, b, c, n00,
    )
    assert abs(row.chi2 - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6
    assert row.chi2 >= 0.0
