"""Semantics tests for the round-41 keys (assortativity, char
coverage, Granger-lite) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_assortativity_matches_python_replay(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    pairs = set()
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        pairs.add((orders[r.l_orderkey] * 2, r.l_suppkey * 2 + 1))
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, _ in edges]
    ys = [deg[b] for _, b in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r_want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = QUERIES["graph_assortativity"](spark, sf_dir).collect()[0]
    assert row.n_edges == n
    assert abs(row.assortativity - r_want) < 1e-5
    assert -1.0 <= row.assortativity <= 1.0


def test_char_coverage_matches_python_replay(spark, sf_dir):
    freq = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        for c in r.text:
            freq[c] = freq.get(c, 0) + 1
    total = sum(freq.values())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    a999 = a9995 = 0
    top100 = 0
    for i, (c, n) in enumerate(ranked):
        if 1000 * cum < 999 * total:
            a999 += 1
        if 10000 * cum < 9995 * total:
            a9995 += 1
        cum += n
        if i < 100:
            top100 = cum
    row = QUERIES["text_char_coverage"](spark, sf_dir).collect()[0]
    assert (row.total_chars, row.distinct_chars) == (total, len(freq))
    assert (row.alpha_999, row.alpha_9995) == (a999, a9995)
    assert row.top100_micro == (2000000 * top100 + total) // (2 * total)
    # coverage targets are nested
    assert row.alpha_999 <= row.alpha_9995 <= row.distinct_chars


def test_granger_lite_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        d = r.ts.date()
        y, v = daily.get(d, (0, 0))
        amt = math.floor(float(r.value) + 0.5)
        if r.event_type == "purchase":
            y += amt
        elif r.event_type == "view":
            v += amt
        daily[d] = (y, v)
    days = sorted(daily)
    pts = [
        (daily[days[i]][0], daily[days[i - 1]][0], daily[days[i - 1]][1])
        for i in range(1, len(days))
    ]
    n = len(pts)
    sy = sum(p[0] for p in pts)
    sx = sum(p[1] for p in pts)
    sz = sum(p[2] for p in pts)
    sxy = sum(p[1] * p[0] for p in pts)
    szy = sum(p[2] * p[0] for p in pts)
    sxz = sum(p[1] * p[2] for p in pts)
    sxx = sum(p[1] * p[1] for p in pts)
    szz = sum(p[2] * p[2] for p in pts)
    syy = sum(p[0] * p[0] for p in pts)
    cxy = float(n * sxy - sx * sy)
    czy = float(n * szy - sz * sy)
    cxz = float(n * sxz - sx * sz)
    cxx = float(n * sxx - sx * sx)
    czz = float(n * szz - sz * sz)
    cyy = float(n * syy - sy * sy)
    sse_r = cyy - cxy * cxy / cxx
    det = cxx * czz - cxz * cxz
    sse_u = cyy - (
        (czz * cxy - cxz * czy) * cxy + (cxx * czy - cxz * cxy) * czy
    ) / det
    ratio = sse_r / sse_u - 1.0
    row = QUERIES["ts_granger_lite"](spark, sf_dir).collect()[0]
    assert row.n_obs == n
    assert abs(row.sse_ratio_minus_1 - ratio) < 1e-5
    assert abs(row.f_stat - ratio * (n - 3)) < 1e-4
    # the unrestricted model can never fit worse than the restricted
    assert row.sse_ratio_minus_1 >= -1e-9
