"""Semantics tests for the round-57 keys (cost curve, recursive
lookup, NPS) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_cost_curve_matches_python_replay(spark, sf_dir):
    pts = sorted(
        (
            math.floor(float(r.value) * 100.0 + 0.5),
            1 if r.event_type == "purchase" else 0,
            r.event_id,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None and r.event_type in ("purchase", "view")
    )
    pts.sort(key=lambda t: (t[0], t[2]))
    n = len(pts)
    rows = {}
    for q in (1, 2, 3):
        thr = pts[(q * n + 3) // 4 - 1][0]
        fp = sum(1 for s, y, _ in pts if s >= thr and y == 0)
        fn = sum(1 for s, y, _ in pts if s < thr and y == 1)
        rows[q] = (thr, fp, fn, fp + 5 * fn)
    best = min(rows, key=lambda q: (rows[q][3], q))
    got = {
        r.quartile: r
        for r in QUERIES["eval_cost_curve"](spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 3}
    for q, (thr, fp, fn, cost) in rows.items():
        r = got[q]
        assert (r.threshold_cents, r.fp, r.fn, r.expected_cost) == (
            thr, fp, fn, cost,
        )
        assert r.is_best == (1 if q == best else 0)


def test_recursive_lookup_matches_census(spark, sf_dir):
    per = {}
    for r in io.load_events(spark, sf_dir).collect():
        n, s = per.get(r.event_type, (0, 0))
        per[r.event_type] = (n + 1, s + r.event_id)
    got = {
        r.event_type: (r.n, r.event_id_sum)
        for r in QUERIES["scan_recursive_lookup"](spark, sf_dir).collect()
    }
    assert got == per


def test_nps_matches_python_replay(spark, sf_dir):
    seg = {"promoter": 0, "passive": 0, "detractor": 0}
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        score = math.floor(float(r.value) * 100.0 + 0.5) % 11
        if score >= 9:
            seg["promoter"] += 1
        elif score >= 7:
            seg["passive"] += 1
        else:
            seg["detractor"] += 1
    total = sum(seg.values())
    nps = _trunc_div(
        2000 * (seg["promoter"] - seg["detractor"]) + total, 2 * total
    )
    got = {
        r.segment: r
        for r in QUERIES["agg_nps"](spark, sf_dir).collect()
    }
    assert {k: v.n for k, v in got.items()} == {
        k: v for k, v in seg.items() if v > 0 or k in got
    }
    for k, r in got.items():
        assert r.share_micro == _trunc_div(
            2000000 * seg[k] + total, 2 * total
        )
        assert r.nps_milli == nps
    assert -1000 <= nps <= 1000
