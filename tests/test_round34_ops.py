"""Semantics tests for the round-34 keys (market basket, RFM,
FD profiling) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_market_basket_matches_python_replay(spark, sf_dir):
    baskets = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item_n, pair_n = {}, {}
    for parts in baskets.values():
        for p in parts:
            item_n[p] = item_n.get(p, 0) + 1
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for c in sp[i + 1 :]:
                pair_n[(a, c)] = pair_n.get((a, c), 0) + 1
    n_orders = len(baskets)
    scored = []
    for (a, c), n_ab in pair_n.items():
        if n_ab < 2:
            continue
        na, nc = item_n[a], item_n[c]
        conf = (2000000 * n_ab + na) // (2 * na)
        lift = (2000000 * n_orders * n_ab + na * nc) // (2 * na * nc)
        scored.append((a, c, n_ab, conf, lift))
    scored.sort(key=lambda t: (-t[4], t[0], t[1]))
    want = {
        (a, c, n_ab, conf, lift, i + 1)
        for i, (a, c, n_ab, conf, lift) in enumerate(scored[:20])
    }
    got = {
        (r.ante, r.cons, r.n_ab, r.conf_micro, r.lift_micro, r.rnk)
        for r in QUERIES["olap_market_basket"](spark, sf_dir).collect()
    }
    assert got == want
    # every reported rule beats independence at this support floor
    # or at least is a real pair (lift is positive)
    assert all(l > 0 for _, _, _, _, l, _ in got)


def _ntile(values, n=5):
    """SQL-standard ntile over an already-sorted list."""
    total = len(values)
    base, rem = divmod(total, n)
    out = {}
    idx = 0
    for b in range(1, n + 1):
        size = base + (1 if b <= rem else 0)
        for _ in range(size):
            out[values[idx]] = b
            idx += 1
    return out


def test_rfm_matches_python_replay(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    gmax = max(r.o_orderdate for r in orders)
    cust = {}
    for r in orders:
        rec, freq, mon = cust.get(r.o_custkey, (None, 0, 0))
        last = (
            r.o_orderdate
            if rec is None
            else max(rec, r.o_orderdate)
        )
        cust[r.o_custkey] = (
            last,
            freq + 1,
            mon + math.floor(float(r.o_totalprice) * 100.0 + 0.5),
        )
    recency = {
        c: (gmax - last).days for c, (last, _, _) in cust.items()
    }
    r_score = _ntile(
        sorted(cust, key=lambda c: (-recency[c], c))
    )
    f_score = _ntile(sorted(cust, key=lambda c: (cust[c][1], c)))
    m_score = _ntile(sorted(cust, key=lambda c: (cust[c][2], c)))
    segs = {}
    for c in cust:
        r_, f_, m_ = r_score[c], f_score[c], m_score[c]
        if r_ >= 4 and f_ >= 4 and m_ >= 4:
            s = "champions"
        elif r_ >= 4 and f_ >= 3:
            s = "loyal"
        elif r_ >= 4:
            s = "recent"
        elif r_ <= 2 and f_ >= 4:
            s = "at_risk"
        elif r_ <= 2 and f_ <= 2:
            s = "lost"
        else:
            s = "regular"
        n, mon, fr = segs.get(s, (0, 0, 0))
        segs[s] = (n + 1, mon + cust[c][2], fr + cust[c][1])
    rows = {
        r.segment: r
        for r in QUERIES["feat_rfm_segmentation"](spark, sf_dir).collect()
    }
    assert set(rows) == set(segs)
    for s, (n, mon, fr) in segs.items():
        assert rows[s].n_customers == n
        assert abs(rows[s].mean_monetary - mon / (100.0 * n)) < 1e-4
        assert abs(rows[s].mean_frequency - fr / n) < 1e-5


def test_fd_violations_matches_python_replay(spark, sf_dir):
    ev = io.load_events(spark, sf_dir).collect()
    rows = {
        r.fd: r
        for r in QUERIES["dq_fd_violations"](spark, sf_dir).collect()
    }
    for lhs, rhs in (
        ("event_id", "user_id"),
        ("user_id", "event_type"),
        ("user_id", "props"),
    ):
        groups = {}
        for r in ev:
            l, rv = getattr(r, lhs), getattr(r, rhs)
            groups.setdefault(l, {})
            groups[l][rv] = groups[l].get(rv, 0) + 1
        violating = sum(1 for g in groups.values() if len(g) > 1)
        g3 = sum(sum(g.values()) - max(g.values()) for g in groups.values())
        r = rows[f"{lhs} -> {rhs}"]
        assert r.n_lhs == len(groups)
        assert r.violating_lhs == violating
        assert r.g3_rows == g3
        assert r.holds == (1 if g3 == 0 else 0)
    # the PK candidate must actually hold on the fixtures
    assert rows["event_id -> user_id"].holds == 1
