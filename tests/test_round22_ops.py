"""Semantics tests for the round-22 breadth keys (burn rate, k-center
init, dimension variance) — independent Python re-derivations, not
oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_burn_rate_matches_python_replay(spark, sf_dir):
    """Replay hourly error/total counts, both burn windows, and the
    multi-window page rule."""
    hours = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        hr = int(r.ts.timestamp() * 1_000_000) // 3_600_000_000
        e, t = hours.get(hr, (0, 0))
        hours[hr] = (e + (1 if r.event_type == "error" else 0), t + 1)
    hr0 = min(hours)
    rel = {hr - hr0: et for hr, et in hours.items()}
    want = {}
    for h in sorted(rel):
        e1, t1 = rel[h]
        e6 = sum(rel[k][0] for k in rel if h - 5 <= k <= h)
        t6 = sum(rel[k][1] for k in rel if h - 5 <= k <= h)
        b1 = e1 * 100000000 // t1
        b6 = e6 * 100000000 // t6
        want[h] = (e1, t1, b1, b6, b1 > 14_400_000 and b6 > 14_400_000)
    got = {
        r.hr_rel: (r.errors, r.total, r.burn1_micro, r.burn6_micro, r.page)
        for r in QUERIES["ts_sli_burn_rate"](spark, sf_dir).collect()
    }
    assert got == want


def test_burn_rate_pages_only_on_sustained_burn():
    """Pure-python property of the policy: a single 100%-error hour in
    an otherwise healthy 6h window does not page on the 6h condition
    when diluted below 14.4x."""
    rel = {h: (0, 1000) for h in range(6)}
    rel[5] = (200, 1000)  # one bad hour: 20% errors -> 20x burn on 1h
    e6 = sum(e for e, _ in rel.values())
    t6 = sum(t for _, t in rel.values())
    b6 = e6 * 100000000 // t6  # 200/6000 = 3.3% -> 3.3x
    assert b6 < 14_400_000  # 6h window refuses the page


def _quantized(spark, sf_dir, scale):
    return {
        r.vec_id: [math.floor(float(v) * scale + 0.5) for v in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }


def test_kcenter_matches_python_replay(spark, sf_dir):
    """Replay the 4 farthest-point picks on exact integer distances."""
    q = _quantized(spark, sf_dir, 1e6)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    first = min(q)
    picks = [(1, first, 0)]
    md = None
    chosen = [first]
    for rnd in range(2, 5):
        c = q[chosen[-1]]
        if md is None:
            md = {vid: d2(v, c) for vid, v in q.items()}
        else:
            md = {vid: min(md[vid], d2(v, c)) for vid, v in q.items()}
        best = min(md, key=lambda vid: (-md[vid], vid))
        picks.append((rnd, best, md[best]))
        chosen.append(best)
    got = {
        (r.sel_round, r.vec_id, r.sel_d2)
        for r in QUERIES["emb_kcenter_init"](spark, sf_dir).collect()
    }
    assert got == set(picks)


def test_kcenter_picks_are_spread():
    """Pure-python property: on a line of points, farthest-point picks
    the extremes before the middle."""

    def d2(a, b):
        return (a - b) * (a - b)

    pts = {i: i for i in range(11)}  # 0..10 on a line
    chosen = [0]
    md = None
    for _ in range(2):
        c = pts[chosen[-1]]
        if md is None:
            md = {k: d2(v, c) for k, v in pts.items()}
        else:
            md = {k: min(md[k], d2(v, c)) for k, v in pts.items()}
        best = min(md, key=lambda k: (-md[k], k))
        chosen.append(best)
    assert chosen == [0, 10, 5]


def test_dim_variance_matches_python_replay(spark, sf_dir):
    """Replay milli-quantized per-dimension moments and the variance
    ranking."""
    q = _quantized(spark, sf_dir, 1e3)
    dims = {}
    for v in q.values():
        for i, x in enumerate(v):
            n, s, s2 = dims.get(i, (0, 0, 0))
            dims[i] = (n + 1, s + x, s2 + x * x)
    var = {
        i: (n * s2 - s * s) / (n * n) for i, (n, s, s2) in dims.items()
    }
    ranked = sorted(var, key=lambda i: (-var[i], i))
    got = {
        r.dim: (r.n, r.mean_milli, r.var_milli2, r.var_rank)
        for r in QUERIES["emb_dim_variance"](spark, sf_dir).collect()
    }
    assert set(got) == set(dims)
    for i, (n, s, s2) in dims.items():
        assert got[i][0] == n
        assert abs(got[i][1] - s / n) < 1e-5
        assert abs(got[i][2] - var[i]) < 1e-3
        assert got[i][3] == ranked.index(i) + 1
