"""Semantics tests for the round-16 breadth keys (exact time-decay
sums, feature standardization, insert-only top-k IVM) — independent
Python re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_decay_sum_matches_python_replay(spark, sf_dir):
    """Replay the integer shift-decay (hl=1d and 7d) in Python and
    compare every group's exact totals."""
    rows = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.value is not None
    ]
    ref = max(r.ts.date() for r in rows)

    def dec(c, a):
        return -((-c) // (1 << a)) if c < 0 else c // (1 << a)

    want = {}
    for r in rows:
        c = math.floor(float(r.value) * 100.0 + 0.5)
        age = min((ref - r.ts.date()).days, 62)
        h1, h7, n, mx = want.get(r.event_type, (0, 0, 0, 0))
        want[r.event_type] = (
            h1 + dec(c, age),
            h7 + dec(c, min(age // 7, 62)),
            n + 1,
            max(mx, age),
        )
    got = {
        r.event_type: (r.decayed_hl1, r.decayed_hl7, r.n_events, r.max_age_days)
        for r in QUERIES["agg_decay_sum"](spark, sf_dir).collect()
    }
    assert got == want


def test_decay_is_halving_per_day():
    """The decay contribution of a fixed value must exactly halve per
    day of age (truncating), including for negative values toward
    zero."""

    def dec(c, a):
        return -((-c) // (1 << a)) if c < 0 else c // (1 << a)

    assert [dec(1000, a) for a in range(5)] == [1000, 500, 250, 125, 62]
    assert dec(-1000, 1) == -500 and dec(-5, 1) == -2  # toward zero


def test_standardize_matches_python_replay(spark, sf_dir):
    """Replay per-group moment sums and min-max in Python; z-scores to
    1e-6, minmax exactly; degenerate groups NULL."""
    rows = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.value is not None
    ]
    stats = {}
    for r in rows:
        c = math.floor(float(r.value) * 100.0 + 0.5)
        n, s, s2, mn, mx = stats.get(
            r.event_type, (0, 0, 0, float("inf"), float("-inf"))
        )
        stats[r.event_type] = (n + 1, s + c, s2 + c * c, min(mn, c), max(mx, c))
    got = {
        r.event_id: (r.z_score, r.minmax_micro)
        for r in QUERIES["feat_standardize"](spark, sf_dir).collect()
    }
    assert len(got) == len(rows)
    for r in rows:
        c = math.floor(float(r.value) * 100.0 + 0.5)
        n, s, s2, mn, mx = stats[r.event_type]
        if n > 1 and n * s2 > s * s:
            sd = math.sqrt((n * s2 - s * s) / (n * (n - 1)))
            assert abs(got[r.event_id][0] - (c - s / n) / sd) < 1e-5
        else:
            assert got[r.event_id][0] is None
        if mx > mn:
            assert got[r.event_id][1] == (c - mn) * 1000000 // (mx - mn)
        else:
            assert got[r.event_id][1] is None


def test_topk_ivm_equals_from_scratch(spark, sf_dir):
    """The merged old-topk + delta ranking must equal the from-scratch
    top-3 computed in Python over the full orders table."""
    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    groups = {}
    for o in rows:
        c = math.floor(float(o.o_totalprice) * 100.0 + 0.5)
        groups.setdefault(o.o_orderpriority, []).append((c, o.o_orderkey))
    want = set()
    for g, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (c, k) in enumerate(items[:3], start=1):
            want.add((g, k, c, rnk))
    got = {
        (r.grp, r.o_orderkey, r.cents, r.rnk)
        for r in QUERIES["ivm_topk_delta"](spark, sf_dir).collect()
    }
    assert got == want


def test_topk_ivm_merge_input_is_bounded(spark, sf_dir):
    """The maintenance path must rank only old-topk + delta rows —
    structurally k*|groups| + |delta|, far below the base size."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    n_delta = sum(1 for o in orders if o.o_orderkey % 10 == 0)
    n_groups = len({o.o_orderpriority for o in orders})
    merged_bound = 3 * n_groups + n_delta
    assert merged_bound < len(orders) / 2
