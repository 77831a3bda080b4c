"""Semantics tests for the round-66 keys (engagement Gini, null-rate
trend, dup inflation) — independent Python re-derivations."""

from __future__ import annotations

import hashlib

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_engagement_gini_matches_python_replay(spark, sf_dir):
    counts = {}
    for r in io.load_events(spark, sf_dir).collect():
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    s = sum(c for _, c in ranked)
    gnum = sum(
        (2 * (i + 1) - n - 1) * c for i, (_, c) in enumerate(ranked)
    )
    top_k = (n + 99) // 100
    top_c = sum(c for _, c in ranked[n - top_k :])
    row = QUERIES["agg_engagement_gini"](spark, sf_dir).collect()[0]
    assert (row.n_users, row.n_events) == (n, s)
    assert row.gini_micro == _trunc_div(
        2000000 * gnum + n * s, 2 * n * s
    )
    assert row.top1pct_share_micro == _trunc_div(
        2000000 * top_c + s, 2 * s
    )
    assert 0 <= row.gini_micro < 1_000_000


def test_null_rate_trend_matches_python_replay(spark, sf_dir):
    ev = io.load_events(spark, sf_dir).collect()
    d0 = min(r.ts.date() for r in ev)
    d1 = max(r.ts.date() for r in ev)
    half_days = (d1 - d0).days // 2
    daily = {}
    halves = {0: [0, 0], 1: [0, 0]}
    for r in ev:
        d = r.ts.date()
        half = 1 if (d - d0).days >= half_days else 0
        n, nn = daily.get(d, (0, 0))
        daily[d] = (n + 1, nn + (r.value is None))
        halves[half][0] += 1
        halves[half][1] += r.value is None
    r0 = _trunc_div(
        2000000 * halves[0][1] + halves[0][0], 2 * halves[0][0]
    )
    r1 = _trunc_div(
        2000000 * halves[1][1] + halves[1][0], 2 * halves[1][0]
    )
    got = {
        r.day: (r.n, r.n_null, r.null_micro, r.half_delta_micro)
        for r in QUERIES["dq_null_rate_trend"](spark, sf_dir).collect()
    }
    assert set(got) == set(daily)
    for d, (n, nn) in daily.items():
        g = got[d]
        assert (g[0], g[1]) == (n, nn)
        assert g[2] == _trunc_div(2000000 * nn + n, 2 * n)
        assert g[3] == r1 - r0


def test_dup_inflation_matches_python_replay(spark, sf_dir):
    per = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks = r.text.split(" ")
        total, uniq = per.get(r.source, (0, set()))
        for i in range(len(toks) - 4):
            g = hashlib.md5(
                " ".join(toks[i : i + 5]).encode()
            ).hexdigest()
            total += 1
            uniq.add(g)
        per[r.source] = (total, uniq)
    all_total = sum(t for t, _ in per.values())
    all_uniq = set()
    for _, u in per.values():
        all_uniq |= u
    want = {
        src: (t, len(u), _trunc_div(2000 * t + len(u), 2 * len(u)))
        for src, (t, u) in per.items()
        if t > 0
    }
    want["_all_"] = (
        all_total,
        len(all_uniq),
        _trunc_div(2000 * all_total + len(all_uniq), 2 * len(all_uniq)),
    )
    got = {
        r.source: (r.total_grams, r.unique_grams, r.inflation_milli)
        for r in QUERIES["corpus_dup_inflation"](spark, sf_dir).collect()
    }
    assert got == want
    # inflation is at least 1000 (total >= unique)
    assert all(v[2] >= 1000 for v in got.values())
