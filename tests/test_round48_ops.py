"""Semantics tests for the round-48 keys (DiD, stratified ATE, EB
shrinkage) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_did_matches_python_replay(spark, sf_dir):
    ev = [
        (r.user_id, int(r.ts.timestamp() * 1e6), r.event_type)
        for r in io.load_events(spark, sf_dir).collect()
    ]
    t0 = min(t for _, t, _ in ev)
    t1 = max(t for _, t, _ in ev)
    half = (t1 - t0) // 2
    cells = {}
    for u, t, et in ev:
        key = (u % 2, 1 if t - t0 >= half else 0)
        n, c = cells.get(key, (0, 0))
        cells[key] = (n + 1, c + (et == "purchase"))
    rates = {
        k: _trunc_div(2000000 * c + n, 2 * n)
        for k, (n, c) in cells.items()
    }
    did = (
        rates[(1, 1)] - rates[(1, 0)] - rates[(0, 1)] + rates[(0, 0)]
    )
    pre_gap = rates[(1, 0)] - rates[(0, 0)]
    rows = QUERIES["ab_did_estimator"](spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n == cells[(r.grp, r.post)][0]
        assert r.rate_micro == rates[(r.grp, r.post)]
        assert r.did_micro == did
        assert r.pre_gap_micro == pre_gap


def _ntile(keys, n=5):
    total = len(keys)
    base, rem = divmod(total, n)
    out = {}
    idx = 0
    for b in range(1, n + 1):
        for _ in range(base + (1 if b <= rem else 0)):
            out[keys[idx]] = b
            idx += 1
    return out


def test_propensity_strata_matches_python_replay(spark, sf_dir):
    users = {}
    for r in io.load_events(spark, sf_dir).collect():
        n, c = users.get(r.user_id, (0, 0))
        users[r.user_id] = (n + 1, c + (r.event_type == "purchase"))
    order = sorted(users, key=lambda u: (users[u][0], u))
    stratum = _ntile(order)
    cells = {}
    for u, (n, c) in users.items():
        s = stratum[u]
        t = u % 2
        key = s
        nt, ct, nc, cc, na = cells.get(key, (0, 0, 0, 0, 0))
        if t == 1:
            nt, ct = nt + 1, ct + c
        else:
            nc, cc = nc + 1, cc + c
        cells[key] = (nt, ct, nc, cc, na + 1)
    gaps = {}
    for s, (nt, ct, nc, cc, na) in cells.items():
        rt = _trunc_div(2000000 * ct + nt, 2 * nt) if nt else None
        rc = _trunc_div(2000000 * cc + nc, 2 * nc) if nc else None
        gaps[s] = (nt, nc, rt, rc, na)
    num = sum(
        na * (rt - rc)
        for nt, nc, rt, rc, na in gaps.values()
        if rt is not None and rc is not None
    )
    den = sum(
        na
        for nt, nc, rt, rc, na in gaps.values()
        if rt is not None and rc is not None
    )
    pooled = _trunc_div(num, den)
    rows = {
        r.stratum: r
        for r in QUERIES["ab_propensity_strata"](spark, sf_dir).collect()
    }
    assert set(rows) == set(cells)
    for s, (nt, nc, rt, rc, na) in gaps.items():
        r = rows[s]
        assert (r.n_treat, r.n_control) == (nt, nc)
        assert r.rate_t_micro == rt and r.rate_c_micro == rc
        if rt is not None and rc is not None:
            assert r.gap_micro == rt - rc
        assert r.pooled_ate_micro == pooled


def test_eb_shrinkage_matches_python_replay(spark, sf_dir):
    users = {}
    for r in io.load_events(spark, sf_dir).collect():
        n, c = users.get(r.user_id, (0, 0))
        users[r.user_id] = (n + 1, c + (r.event_type == "purchase"))
    raws = {
        u: _trunc_div(2000000 * c + n, 2 * n)
        for u, (n, c) in users.items()
    }
    k = len(users)
    sc = sum(c for _, c in users.values())
    sn = sum(n for n, _ in users.values())
    sr = sum(raws.values())
    srr = sum(float(v) * v for v in raws.values())
    mu = sc / sn
    var_hat = max((srr / k - (sr / k) * (sr / k)) / 1e6 / 1e6, 1e-7)
    m0 = max(mu * (1.0 - mu) / var_hat - 1.0, 1.0)
    shrunk = {
        u: math.floor(1e6 * (c + m0 * mu) / (n + m0) + 0.5)
        for u, (n, c) in users.items()
    }
    head = sorted(shrunk, key=lambda u: (-shrunk[u], u))[:10]
    got = {
        r.user_id: r
        for r in QUERIES["ab_eb_shrinkage"](spark, sf_dir).collect()
    }
    assert set(got) == set(head)
    for i, u in enumerate(head):
        r = got[u]
        n, c = users[u]
        assert (r.n, r.conversions, r.raw_micro) == (n, c, raws[u])
        assert r.shrunk_micro == shrunk[u]
        assert r.rnk == i + 1
        # shrinkage pulls toward the pooled mean
        mu_micro = 1e6 * mu
        assert (
            min(raws[u], mu_micro) - 1
            <= r.shrunk_micro
            <= max(raws[u], mu_micro) + 1
        )
