"""Semantics tests for the round-46 keys (CVaR/ES, xcorr lead scan,
multi-char delim CSV) — independent Python re-derivations."""

from __future__ import annotations

import datetime
import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_cvar_es_matches_python_replay(spark, sf_dir):
    cents = sorted(
        (
            math.floor(float(r.o_totalprice) * 100.0 + 0.5),
            r.o_orderkey,
        )
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    )
    n = len(cents)
    var_rk = (19 * n + 19) // 20
    var = cents[var_rk - 1][0]
    tail = [c for c, _ in cents[var_rk - 1 :]]
    es = (2000000 * sum(tail) + 100 * len(tail)) // (200 * len(tail))
    row = QUERIES["agg_cvar_es"](spark, sf_dir).collect()[0]
    assert (row.n, row.var95_cents, row.tail_n) == (n, var, len(tail))
    assert row.es_micro == es
    # ES dominates VaR (the tail mean sits at or beyond its start)
    assert row.es_micro >= row.var95_cents * 10000


def test_xcorr_lead_scan_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        d = r.ts.date()
        x, y = daily.get(d, (0, 0))
        amt = math.floor(float(r.value) + 0.5)
        if r.event_type == "view":
            x += amt
        elif r.event_type == "purchase":
            y += amt
        daily[d] = (x, y)
    days = sorted(daily)
    dd = len(days)
    sx = sum(v[0] for v in daily.values())
    sy = sum(v[1] for v in daily.values())
    xc = {d: daily[d][0] * dd - sx for d in days}
    yc = {d: daily[d][1] * dd - sy for d in days}
    den = math.sqrt(
        float(sum(v * v for v in xc.values()))
        * float(sum(v * v for v in yc.values()))
    )
    want = {}
    for lag in range(-7, 8):
        num = 0
        cnt = 0
        for d in days:
            d2 = d + datetime.timedelta(days=lag)
            if d2 in yc:
                num += xc[d] * yc[d2]
                cnt += 1
        want[lag] = (cnt, round(num / den, 6))
    best = min(want, key=lambda l: (-abs(want[l][1]), l))
    got = {
        r.lag: (r.n_overlap, r.r, r.is_best)
        for r in QUERIES["ts_xcorr_lead_scan"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for lag, (cnt, r_) in want.items():
        g = got[lag]
        assert g[0] == cnt
        assert abs(g[1] - r_) < 2e-6
        assert g[2] == (1 if lag == best else 0)
    # lag 0 correlation is within [-1, 1]
    assert -1.0 <= got[0][1] <= 1.0


def test_multichar_delim_roundtrip(spark, sf_dir):
    per = {}
    for r in io.load_events(spark, sf_dir).collect():
        n, us, es = per.get(r.event_type, (0, 0, 0))
        per[r.event_type] = (n + 1, us + r.user_id, es + r.event_id)
    got = {
        r.event_type: (r.n, r.user_id_sum, r.event_id_sum)
        for r in QUERIES["scan_csv_multichar_delim"](
            spark, sf_dir
        ).collect()
    }
    assert got == per
