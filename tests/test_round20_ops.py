"""Semantics tests for the round-20 breadth keys (delta-method ratio
test, HITS, Zipf fit) — independent Python re-derivations, not oracle
re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_ratio_delta_method_matches_python_replay(spark, sf_dir):
    """Replay per-user (x, y), the ratio-of-sums, and the delta-method
    variance in Python."""
    per_user = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        x, y = per_user.get(r.user_id, (0, 0))
        per_user[r.user_id] = (x + c, y + 1)
    stats = {}
    for v in (0, 1):
        pts = [xy for uid, xy in per_user.items() if uid % 2 == v]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        r = sx / sy
        my = sy / n
        vx = (n * sxx - sx * sx) / (n * (n - 1))
        vy = (n * syy - sy * sy) / (n * (n - 1))
        cxy = (n * sxy - sx * sy) / (n * (n - 1))
        var_r = (vx + r * r * vy - 2 * r * cxy) / (n * my * my)
        stats[v] = (n, r, var_r)
    t = (stats[1][1] - stats[0][1]) / math.sqrt(stats[0][2] + stats[1][2])
    (row,) = QUERIES["ab_ratio_delta_method"](spark, sf_dir).collect()
    assert (row.n0, row.n1) == (stats[0][0], stats[1][0])
    assert abs(row.ratio0 - stats[0][1]) < 1e-5
    assert abs(row.ratio1 - stats[1][1]) < 1e-5
    assert abs(row.t_stat - t) < 1e-5
    assert row.significant == (abs(t) > 1.96)


def _cust_supp_edges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    return {(orders[r.l_orderkey] * 2, r.l_suppkey * 2 + 1) for r in li}


def test_hits_matches_python_fixed_point_replay(spark, sf_dir):
    """Replay 2 HITS rounds with integer max-normalization in Python
    and compare the top-100 rows exactly."""
    SCALE = 1_000_000
    pairs = _cust_supp_edges(spark, sf_dir)
    hubs = {c for c, _ in pairs}
    h = {c: SCALE for c in hubs}
    a = {}
    for _ in range(2):
        raw_a = {}
        for c, s in pairs:
            raw_a[s] = raw_a.get(s, 0) + h.get(c, 0)
        mx = max(raw_a.values())
        a = {s: r * SCALE // mx for s, r in raw_a.items()}
        raw_h = {}
        for c, s in pairs:
            raw_h[c] = raw_h.get(c, 0) + a[s]
        mx = max(raw_h.values())
        h = {c: r * SCALE // mx for c, r in raw_h.items()}
    scored = [(n, "hub", s) for n, s in h.items()] + [
        (n, "authority", s) for n, s in a.items()
    ]
    scored.sort(key=lambda t: (-t[2], t[0]))
    want = set(scored[:100])
    got = {
        (r.node, r.role, r.score_fp)
        for r in QUERIES["graph_hits"](spark, sf_dir).collect()
    }
    assert got == want


def test_hits_max_score_is_scale(spark, sf_dir):
    """Max-normalization invariant: the best hub and best authority
    both sit exactly at the fixed-point 1.0."""
    rows = QUERIES["graph_hits"](spark, sf_dir).collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r.score_fp)
    assert max(by_role["hub"]) == 1_000_000
    assert max(by_role["authority"]) == 1_000_000


def test_zipf_fit_matches_python_replay(spark, sf_dir):
    """Replay the rank table, micro-nat points, and OLS in Python."""
    freq = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        for t in d.text.split(" "):
            freq[t] = freq.get(t, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [
        (
            math.floor(math.log(i + 1) * 1e6 + 0.5),
            math.floor(math.log(c) * 1e6 + 0.5),
        )
        for i, (_, c) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - sx * slope) / n / 1e6
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    (row,) = QUERIES["text_zipf_fit"](spark, sf_dir).collect()
    assert row.n_points == n
    assert abs(row.zipf_slope - slope) < 1e-5
    assert abs(row.ln_c_intercept - intercept) < 1e-5
    assert abs(row.r2 - r2) < 1e-5
    # a frequency-ranked curve always slopes down
    assert row.zipf_slope < 0
