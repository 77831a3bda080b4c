"""Semantics tests for the round-18 breadth keys (Kaplan–Meier,
power/MDE planning, change attribution) — independent Python
re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_kaplan_meier_matches_python_replay(spark, sf_dir):
    """Replay lifetimes, censoring, risk sets, and the log-space
    survival accumulation in Python; compare all columns."""
    spans = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        day = r.ts.date()
        lo, hi = spans.get(r.user_id, (day, day))
        spans[r.user_id] = (min(lo, day), max(hi, day))
    max_day = max(hi for _, hi in spans.values())
    life = []
    for lo, hi in spans.values():
        life.append(((hi - lo).days, (max_day - hi).days >= 7))
    t = {}
    for dur, obs in life:
        d, c = t.get(dur, (0, 0))
        t[dur] = (d + 1, c) if obs else (d, c + 1)
    total = len(life)
    want = {}
    cum = 0
    exhausted = False
    removed = 0
    for dur in sorted(t):
        d, c = t[dur]
        n_risk = total - removed
        removed += d + c
        if d == 0:
            term = 0
        elif n_risk > d:
            term = math.floor(
                math.log((n_risk - d) / n_risk) * 1000000.0 + 0.5
            )
        else:
            term = None
        if term is None or exhausted:
            exhausted = True
            want[dur] = (n_risk, d, c, None, 0.0)
        else:
            cum += term
            want[dur] = (n_risk, d, c, cum, round(math.exp(cum / 1e6), 6))
    got = {
        r.dur_days: (r.n_risk, r.d_events, r.c_censored, r.cum_mnat, r.survival)
        for r in QUERIES["ts_kaplan_meier"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:4] == want[k][:4]
        assert abs(got[k][4] - want[k][4]) < 1e-6


def test_kaplan_meier_is_monotone_nonincreasing(spark, sf_dir):
    """Survival curves never rise."""
    rows = sorted(
        QUERIES["ts_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.dur_days,
    )
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival + 1e-9


def test_power_mde_matches_python_replay(spark, sf_dir):
    """Replay the pooled variance and the two planning formulas."""
    per_user = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        per_user[r.user_id] = per_user.get(r.user_id, 0) + c
    groups = {0: [], 1: []}
    for uid, tot in per_user.items():
        groups[uid % 2].append(tot)

    def svar(vals):
        n, s, s2 = len(vals), sum(vals), sum(v * v for v in vals)
        return (n * s2 - s * s) / (n * (n - 1))

    n0, n1 = len(groups[0]), len(groups[1])
    m0 = sum(groups[0]) / n0
    v = (svar(groups[0]) + svar(groups[1])) / 2.0
    zsum = 1.959964 + 0.841621
    mde = zsum * math.sqrt(v / n0 + v / n1)
    n_req = math.ceil(2.0 * zsum * zsum * v / (0.01 * m0) ** 2)
    (row,) = QUERIES["ab_power_mde"](spark, sf_dir).collect()
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.mean0 - m0) < 1e-5
    assert abs(row.var_pooled - v) < 1e-3
    assert abs(row.mde_abs - mde) < 1e-5
    assert row.n_per_arm_1pct == n_req
    # planning sanity: detecting a 1% lift needs more users than we have
    # unless the metric is extremely low-variance
    assert row.n_per_arm_1pct > 0


def test_change_attribution_matches_python_replay(spark, sf_dir):
    """Replay the midpoint split, per-segment deltas, sign-safe
    contribution shares, and ranks."""
    rows = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.value is not None
    ]
    days = [r.ts.date() for r in rows]
    from datetime import timedelta

    lo, hi = min(days), max(days)
    mid = lo + timedelta(days=(hi - lo).days // 2)
    seg = {}
    for r in rows:
        c = math.floor(float(r.value) * 100.0 + 0.5)
        a, b = seg.get(r.event_type, (0, 0))
        if r.ts.date() <= mid:
            a += c
        else:
            b += c
        seg[r.event_type] = (a, b)
    tot_abs = sum(abs(b - a) for a, b in seg.values())
    ranked = sorted(seg, key=lambda k: (-abs(seg[k][1] - seg[k][0]), k))
    got = {
        r.event_type: (r.a_cents, r.b_cents, r.delta, r.contrib_micro, r.rnk)
        for r in QUERIES["dq_change_attribution"](spark, sf_dir).collect()
    }
    assert set(got) == set(seg)
    for et, (a, b) in seg.items():
        delta = b - a
        if tot_abs == 0:
            contrib = 0
        elif delta < 0:
            contrib = -((-delta) * 1000000 // tot_abs)
        else:
            contrib = delta * 1000000 // tot_abs
        assert got[et] == (a, b, delta, contrib, ranked.index(et) + 1)
