"""Semantics tests for the round-64 keys (average precision,
newsvendor, GROUP BY ALL) — independent Python re-derivations."""

from __future__ import annotations

import math
from datetime import date

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_average_precision_matches_python_replay(spark, sf_dir):
    pts = sorted(
        (
            -math.floor(float(r.value) * 100.0 + 0.5),
            r.event_id,
            1 if r.event_type == "purchase" else 0,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None and r.event_type in ("purchase", "view")
    )
    terms = []
    pos = 0
    for k, (_, _, y) in enumerate(pts, start=1):
        pos += y
        if y == 1:
            terms.append(_trunc_div(2000000 * pos + k, 2 * k))
    row = QUERIES["eval_average_precision"](spark, sf_dir).collect()[0]
    assert row.n_pos == len(terms)
    assert row.ap_sum_micro == sum(terms)
    assert row.ap_micro == _trunc_div(
        2 * sum(terms) + len(terms), 2 * len(terms)
    )
    # AP is bounded by (0, 1] and above the base rate for a
    # better-than-random ranking; at minimum it is a probability
    assert 0 < row.ap_micro <= 1_000_000


def test_newsvendor_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    rev, demand = {}, {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        cents = math.floor(float(r.l_extendedprice) * 100.0 + 0.5)
        qty = math.floor(float(r.l_quantity) + 0.5)
        wk = (r.l_shipdate.date() - epoch).days // 7
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + cents
        demand[(r.l_partkey, wk)] = (
            demand.get((r.l_partkey, wk), 0) + qty
        )
    top = sorted(rev, key=lambda p: (-rev[p], p))[:10]
    got = {
        r.part: r
        for r in QUERIES["agg_newsvendor_level"](spark, sf_dir).collect()
    }
    assert set(got) == set(top)
    for p in top:
        qs = sorted(q for (pp, _), q in demand.items() if pp == p)
        n = len(qs)
        level = qs[(5 * n + 5) // 6 - 1]
        r = got[p]
        assert (r.n_weeks, r.order_up_to, r.max_weekly_demand) == (
            n, level, qs[-1],
        )
        assert r.order_up_to <= r.max_weekly_demand


def test_group_by_all_matches_python_replay(spark, sf_dir):
    cells = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        key = (r.o_orderstatus, r.o_orderpriority)
        n, s = cells.get(key, (0, 0))
        cells[key] = (
            n + 1,
            s + math.floor(float(r.o_totalprice) * 100.0 + 0.5),
        )
    got = {
        (r.o_orderstatus, r.o_orderpriority): (r.n, r.cents_sum)
        for r in QUERIES["sql_group_by_all"](spark, sf_dir).collect()
    }
    assert got == cells
