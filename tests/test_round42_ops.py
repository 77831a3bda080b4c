"""Semantics tests for the round-42 keys (burstiness, autoperiod,
Spearman) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_burstiness_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    nd = len(docs)
    per = {}
    for d in docs:
        counts = {}
        for t in d.text.split(" "):
            counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            s, s2, df = per.get(t, (0, 0, 0))
            per[t] = (s + c, s2 + c * c, df + 1)
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))[:50]
    want = {}
    for i, (t, (s, s2, df)) in enumerate(ranked):
        vmr = (2000000 * (nd * s2 - s * s) + nd * s) // (2 * nd * s)
        want[t] = (s, df, vmr, i + 1)
    got = {
        r.token: (r.total, r.doc_freq, r.vmr_micro, r.rnk)
        for r in QUERIES["text_burstiness"](spark, sf_dir).collect()
    }
    assert got == want
    # VMR >= the underdispersion floor: a token appearing once per
    # doc it touches has VMR = 1 - s/nd < 1; all values positive
    assert all(v[2] > 0 for v in got.values())


def test_autoperiod_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + 1
    days = sorted(daily)
    dmin, n_span = days[0], (days[-1] - days[0]).days + 1
    d_obs, s = len(days), sum(daily.values())
    xc = {d: daily[d] * d_obs - s for d in days}
    spec = {}
    for k in range(2, 11):
        sc = ss = 0
        for d in days:
            t = (d - dmin).days
            ang = (6.283185307179586 * (k * t)) / n_span
            sc += xc[d] * math.floor(math.cos(ang) * 1e6 + 0.5)
            ss += xc[d] * math.floor(math.sin(ang) * 1e6 + 0.5)
        spec[k] = float(sc) * sc + float(ss) * ss
    cands = sorted(spec, key=lambda k: (-spec[k], k))[:3]
    d2 = sum(v * v for v in xc.values())

    def trunc_div(a, b):
        """Engines' integral division truncates toward zero."""
        q = abs(a) // b
        return q if a >= 0 else -q

    import datetime

    rows_want = {}
    accs = {}
    for prank, k in enumerate(cands, start=1):
        period = math.floor(n_span / k + 0.5)
        num = 0
        for d in days:
            dd = d + datetime.timedelta(days=period)
            if dd in xc:
                num += xc[d] * xc[dd]
        acf = trunc_div(2000000 * num + d2, 2 * d2)
        rows_want[k] = (period, prank, acf)
        accs[k] = acf
    best = min(cands, key=lambda k: (-accs[k], rows_want[k][0]))
    got = {
        r.k: (r.period_days, r.power_rank, r.acf_micro, r.is_best)
        for r in QUERIES["ts_autoperiod"](spark, sf_dir).collect()
    }
    assert set(got) == set(rows_want)
    for k, (period, prank, acf) in rows_want.items():
        assert got[k] == (period, prank, acf, 1 if k == best else 0)


def test_spearman_matches_scipy_style_replay(spark, sf_dir):
    sig = [
        (r.n_chars, len(r.text.split(" ")))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]

    def midranks2(vals):
        order = sorted(set(vals))
        below = {}
        seen = 0
        counts = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        for v in order:
            below[v] = seen
            seen += counts[v]
        return {v: 2 * below[v] + counts[v] + 1 for v in order}

    ma = midranks2([a for a, _ in sig])
    mb = midranks2([b for _, b in sig])
    xs = [ma[a] for a, _ in sig]
    ys = [mb[b] for _, b in sig]
    n = len(sig)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = QUERIES["eval_spearman_rho"](spark, sf_dir).collect()[0]
    assert row.n == n
    assert abs(row.spearman_rho - rho) < 1e-5
    # chars and token count must correlate strongly positively
    assert row.spearman_rho > 0.5
