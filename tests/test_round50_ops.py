"""Semantics tests for the round-50 keys (underwater spells, ROC
points, Mahalanobis outliers) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_underwater_spell_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type != "purchase" or r.value is None:
            continue
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    days = sorted(daily)
    peak = None
    spells = []
    cur = None
    for d in days:
        v = daily[d]
        under = peak is not None and v < peak
        peak = v if peak is None else max(peak, v)
        if under:
            if cur is None:
                cur = [d, d, 1]
            else:
                cur[1], cur[2] = d, cur[2] + 1
        else:
            if cur:
                spells.append(tuple(cur))
                cur = None
    if cur:
        spells.append(tuple(cur))
    spells.sort(key=lambda s: (-s[2], s[0]))
    want = {
        (s[0], s[1], s[2], i + 1) for i, s in enumerate(spells[:3])
    }
    got = {
        (r.spell_start, r.spell_end, r.spell_days, r.rnk)
        for r in QUERIES["win_underwater_spell"](spark, sf_dir).collect()
    }
    assert got == want


def test_roc_points_match_python_replay(spark, sf_dir):
    pts = sorted(
        (
            math.floor(float(r.value) * 100.0 + 0.5),
            1 if r.event_type == "purchase" else 0,
            r.event_id,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None and r.event_type in ("purchase", "view")
    )
    n = len(pts)
    pos = sum(y for _, y, _ in pts)
    neg = n - pos
    got = {
        r.decile: r
        for r in QUERIES["eval_roc_points"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 10))
    prev_tpr = prev_fpr = 10**9
    for d in range(1, 10):
        thr = pts[(d * n + 9) // 10 - 1][0]
        tp = sum(1 for s, y, _ in pts if s >= thr and y == 1)
        fp = sum(1 for s, y, _ in pts if s >= thr and y == 0)
        r = got[d]
        assert r.threshold_cents == thr
        assert r.tpr_micro == _trunc_div(2000000 * tp + pos, 2 * pos)
        assert r.fpr_micro == _trunc_div(2000000 * fp + neg, 2 * neg)
        # higher threshold => both rates non-increasing
        assert r.tpr_micro <= prev_tpr and r.fpr_micro <= prev_fpr
        prev_tpr, prev_fpr = r.tpr_micro, r.fpr_micro


def test_mahalanobis_matches_python_replay(spark, sf_dir):
    users = {}
    for r in io.load_events(spark, sf_dir).collect():
        a, b = users.get(r.user_id, (0, 0))
        a += 1
        if r.event_type == "purchase" and r.value is not None:
            b += math.floor(float(r.value) + 0.5)
        users[r.user_id] = (a, b)
    n = len(users)
    sa = sum(a for a, _ in users.values())
    sb = sum(b for _, b in users.values())
    saa = sum(a * a for a, _ in users.values())
    sbb = sum(b * b for _, b in users.values())
    sab = sum(a * b for a, b in users.values())
    cxx = float(n * saa - sa * sa)
    cyy = float(n * sbb - sb * sb)
    cxy = float(n * sab - sa * sb)
    mx, my = sa / n, sb / n
    det = cxx * cyy - cxy * cxy
    quads = {}
    for u, (a, b) in users.items():
        dx, dy = a - mx, b - my
        quads[u] = cyy * dx * dx - 2.0 * cxy * dx * dy + cxx * dy * dy
    head = sorted(quads, key=lambda u: (-quads[u], u))[:10]
    got = {
        r.user_id: r
        for r in QUERIES["dq_mahalanobis_outliers"](spark, sf_dir).collect()
    }
    assert set(got) == set(head)
    for i, u in enumerate(head):
        r = got[u]
        assert (r.activity, r.spend_dollars) == users[u]
        assert r.d2_micro == math.floor(
            1e6 * n * quads[u] / det + 0.5
        )
        assert r.rnk == i + 1
        assert r.d2_micro >= 0
