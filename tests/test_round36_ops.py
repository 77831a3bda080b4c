"""Semantics tests for the round-36 keys (kNN classifier, VWAP/TWAP,
streaks) — independent Python re-derivations."""

from __future__ import annotations

import math
from datetime import date, timedelta

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_knn_classifier_matches_python_replay(spark, sf_dir):
    embs = {
        r.vec_id: (list(r.embedding), r.label)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na * nb else None

    per_label = {}
    for vid, (ea, la) in embs.items():
        cands = []
        for nid, (eb, lb) in embs.items():
            if nid == vid or nid % 16 != vid % 16:
                continue
            c = cos(ea, eb)
            cands.append((-c, nid, lb))
        cands.sort()
        top = cands[:5]
        votes = {}
        for _, _, lb in top:
            votes[lb] = votes.get(lb, 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        n, ok = per_label.get(la, (0, 0))
        per_label[la] = (n + 1, ok + (pred == la))
    rows = {
        r.label: r
        for r in QUERIES["ml_knn_classifier"](spark, sf_dir).collect()
    }
    assert set(rows) == set(per_label)
    for la, (n, ok) in per_label.items():
        r = rows[la]
        assert (r.n, r.n_correct) == (n, ok)
        assert r.acc_micro == (2000000 * ok + n) // (2 * n)


def test_vwap_twap_matches_python_replay(spark, sf_dir):
    days = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        d = r.l_shipdate.date()
        cents = math.floor(float(r.l_extendedprice) * 100.0 + 0.5)
        qty = math.floor(float(r.l_quantity) + 0.5)
        n, vol, pq, p = days.get(d, (0, 0, 0, 0))
        days[d] = (n + 1, vol + qty, pq + cents * qty, p + cents)
    rows = {
        r.day: r for r in QUERIES["agg_vwap_twap"](spark, sf_dir).collect()
    }
    assert set(rows) == set(days)
    for d, (n, vol, pq, p) in days.items():
        r = rows[d]
        assert (r.n_fills, r.volume) == (n, vol)
        assert r.vwap_micro == (2000000 * pq + 100 * vol) // (200 * vol)
        assert r.twap_micro == (2000000 * p + 100 * n) // (200 * n)
        # micro-dollar scale sanity
        assert abs(r.vwap_micro / 1e6 - pq / (100.0 * vol)) < 1e-5


def test_streaks_match_python_replay(spark, sf_dir):
    active = {}
    for r in io.load_events(spark, sf_dir).collect():
        active.setdefault(r.user_id, set()).add(r.ts.date())
    census = {}
    for u, days in active.items():
        best = cur = 0
        prev = None
        for d in sorted(days):
            cur = cur + 1 if prev == d - timedelta(days=1) else 1
            best = max(best, cur)
            prev = d
        census[best] = census.get(best, 0) + 1
    got = {
        r.streak_days: r.n_users
        for r in QUERIES["win_streak_days"](spark, sf_dir).collect()
    }
    assert got == census
    # sanity: total users preserved
    assert sum(got.values()) == len(active)
