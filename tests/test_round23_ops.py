"""Semantics tests for the round-23 breadth keys (Tukey fences,
join-consistent sampling, growth accounting) — independent Python
re-derivations, not oracle re-runs."""

from __future__ import annotations

import hashlib
import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_iqr_fence_matches_python_replay(spark, sf_dir):
    """Replay daily cents, nearest-rank quartiles, integer fences, and
    outlier counts."""
    daily = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        k = (r.event_type, r.ts.date())
        daily[k] = daily.get(k, 0) + math.floor(float(r.value) * 100.0 + 0.5)
    series = {}
    for (et, day), c in daily.items():
        series.setdefault(et, []).append((c, day))
    want = {}
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        q1 = pts[(n - 1) // 4][0]
        q3 = pts[3 * (n - 1) // 4][0]
        iqr = q3 - q1
        lo = q1 - 3 * iqr // 2
        hi = q3 + 3 * iqr // 2
        out = sum(1 for c, _ in pts if c < lo or c > hi)
        want[et] = (n, q1, q3, lo, hi, out)
    got = {
        r.event_type: (r.n_days, r.q1, r.q3, r.lo_fence, r.hi_fence, r.n_outliers)
        for r in QUERIES["ts_iqr_fence"](spark, sf_dir).collect()
    }
    assert got == want


def _keep(key: int) -> bool:
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    return h % 100 < 20


def test_join_consistent_sampling_matches_python_replay(spark, sf_dir):
    """Replay the key-hash sample on both tables and the joined
    aggregate; also assert the defining property — NO orphans."""
    orders = {
        o.o_orderkey: o.o_orderpriority
        for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
        if _keep(o.o_orderkey)
    }
    agg = {}
    n_orphans = 0
    for l in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        if not _keep(l.l_orderkey):
            continue
        if l.l_orderkey not in orders:
            n_orphans += 1
            continue
        pri = orders[l.l_orderkey]
        n, rev, keys = agg.get(pri, (0, 0, set()))
        keys.add(l.l_orderkey)
        agg[pri] = (
            n + 1,
            rev + math.floor(float(l.l_extendedprice) * 100.0 + 0.5),
            keys,
        )
    # the sample is join-consistent: a sampled lineitem's order is
    # always sampled too (same key, same hash)
    assert n_orphans == 0
    got = {
        r.priority: (r.n_orders, r.n_lineitems, r.revenue_c)
        for r in QUERIES["join_sample_consistent"](spark, sf_dir).collect()
    }
    want = {p: (len(keys), n, rev) for p, (n, rev, keys) in agg.items()}
    assert got == want


def test_growth_accounting_matches_python_replay(spark, sf_dir):
    """Replay the weekly user-period sets and the four-way state
    decomposition, including the active = new+retained+resurrected
    identity."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    d0 = min(r.ts.date() for r in ev)
    periods = {}
    for r in ev:
        p = (r.ts.date() - d0).days // 7
        periods.setdefault(r.user_id, set()).add(p)
    stats = {}
    for uid, ps in periods.items():
        first = min(ps)
        for p in ps:
            key = stats.setdefault(p, [0, 0, 0, 0])  # new ret res chu
            if p == first:
                key[0] += 1
            elif p - 1 in ps:
                key[1] += 1
            else:
                key[2] += 1
        for p in ps:
            if p + 1 not in ps:
                stats.setdefault(p + 1, [0, 0, 0, 0])[3] += 1
    # churn rows only surface for periods that have activity
    want = {
        p: tuple(v) for p, v in stats.items() if v[0] + v[1] + v[2] > 0
    }
    got = {
        r.period: (r.new_users, r.retained, r.resurrected, r.churned)
        for r in QUERIES["agg_growth_accounting"](spark, sf_dir).collect()
    }
    assert got == want
    # identity: every active user is exactly one of new/ret/res
    for p, (nw, rt, rs, _) in got.items():
        active = sum(
            1 for ps in periods.values() if p in ps
        )
        assert nw + rt + rs == active
