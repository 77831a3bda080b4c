"""Semantics tests for the round-29 breadth keys (windowFunnel,
pass@k, winsorized mean) — independent Python re-derivations, not
oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()

_WIN_US = 48 * 3600 * 1_000_000


def _events(spark, sf_dir):
    return [
        (
            r.user_id,
            r.event_id,
            r.event_type,
            int(r.ts.timestamp() * 1_000_000),
            r.value,
        )
        for r in io.load_events(spark, sf_dir).collect()
    ]


def test_funnel_window_matches_bruteforce(spark, sf_dir):
    """Brute-force every view->click->purchase triple per user — the
    greedy window chain must agree with exhaustive search."""
    ev = _events(spark, sf_dir)
    by_user = {}
    for u, eid, et, ts, _ in ev:
        by_user.setdefault(u, []).append((ts, eid, et))
    depth = {}
    for u, rows in by_user.items():
        d = 0
        views = [(t, i) for t, i, et in rows if et == "view"]
        clicks = [(t, i) for t, i, et in rows if et == "click"]
        purch = [(t, i) for t, i, et in rows if et == "purchase"]
        if views:
            d = 1
        for vt, vi in views:
            for ct, ci in clicks:
                if (ct, ci) > (vt, vi) and ct <= vt + _WIN_US:
                    d = max(d, 2)
                    for pt, pi in purch:
                        if (pt, pi) > (ct, ci) and pt <= vt + _WIN_US:
                            d = max(d, 3)
        depth[u] = d
    want = {}
    for d in depth.values():
        want[d] = want.get(d, 0) + 1
    got = {
        r.depth: r.n_users
        for r in QUERIES["funnel_window"](spark, sf_dir).collect()
    }
    assert got == want


def test_pass_at_k_matches_python_replay(spark, sf_dir):
    """Replay the 5-factor binomial-ratio product per problem."""
    ev = _events(spark, sf_dir)
    stats = {}
    for u, _, et, _, _ in ev:
        n, c = stats.get(u, (0, 0))
        stats[u] = (n + 1, c + (1 if et == "purchase" else 0))
    p1s, p5s, certain = [], [], 0
    for n, c in stats.values():
        if n < 5:
            continue
        p1s.append(math.floor(1e6 * (c / n) + 0.5))
        if n - c < 5:
            p5 = 1000000
        else:
            fail = 1.0
            for j in range(5):
                fail = fail * ((n - c - j) / (n - j))
            p5 = math.floor(1e6 * (1.0 - fail) + 0.5)
        p5s.append(p5)
        certain += p5 == 1000000
    row = QUERIES["eval_pass_at_k"](spark, sf_dir).collect()[0]
    assert row.n_problems == len(p1s)
    assert abs(row.pass_at_1 - sum(p1s) / (1e6 * len(p1s))) < 1e-5
    assert abs(row.pass_at_5 - sum(p5s) / (1e6 * len(p5s))) < 1e-5
    assert row.n_certain == certain
    # pass@5 >= pass@1 always (more samples, more chances)
    assert row.pass_at_5 >= row.pass_at_1 - 1e-9


def test_winsorized_mean_matches_python_replay(spark, sf_dir):
    """Replay the nearest-rank cuts and the clamped means."""
    ev = _events(spark, sf_dir)
    groups = {}
    for _, eid, et, _, val in ev:
        if val is None:
            continue
        groups.setdefault(et, []).append(
            (math.floor(float(val) * 100.0 + 0.5), eid)
        )
    rows = {
        r.event_type: r
        for r in QUERIES["agg_winsorized_mean"](spark, sf_dir).collect()
    }
    assert set(rows) == set(groups)
    for et, vals in groups.items():
        vals.sort()
        n = len(vals)
        lo = vals[(n + 19) // 20 - 1][0]
        hi = vals[(19 * n + 19) // 20 - 1][0]
        r = rows[et]
        assert (r.n, r.lo_cents, r.hi_cents) == (n, lo, hi)
        wmean = sum(min(max(c, lo), hi) for c, _ in vals) / (100.0 * n)
        rmean = sum(c for c, _ in vals) / (100.0 * n)
        assert abs(r.winsorized_mean - wmean) < 1e-5
        assert abs(r.raw_mean - rmean) < 1e-5
        # clamping can only pull the mean toward the cut interval
        assert lo / 100.0 - 1e-9 <= r.winsorized_mean <= hi / 100.0 + 1e-9
