"""Semantics tests for the round-58 keys (DAU/WAU, casing profile,
rank stability) — independent Python re-derivations."""

from __future__ import annotations

import math
import re
from datetime import date

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_dau_mau_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    act = set()
    for r in io.load_events(spark, sf_dir).collect():
        d = r.ts.date()
        act.add((r.user_id, d, (d - epoch).days // 7))
    weeks = {}
    for u, d, wk in act:
        days, users = weeks.setdefault(wk, ({}, set()))
        days[d] = days.get(d, 0) + 1
        users.add(u)
    got = {
        r.week_idx: r
        for r in QUERIES["agg_dau_mau"](spark, sf_dir).collect()
    }
    assert set(got) == set(weeks)
    for wk, (days, users) in weeks.items():
        r = got[wk]
        dau_sum = sum(days.values())
        assert (r.n_days, r.dau_sum, r.wau) == (
            len(days), dau_sum, len(users),
        )
        assert r.stickiness_micro == _trunc_div(
            2000000 * dau_sum + len(days) * len(users),
            2 * len(days) * len(users),
        )
        # stickiness is a share in (0, 1]
        assert 0 < r.stickiness_micro <= 1_000_000


def test_casing_profile_matches_python_replay(spark, sf_dir):
    per = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        for t in r.text.split(" "):
            if not t:
                continue
            n, c, ti = per.get(r.source, (0, 0, 0))
            per[r.source] = (
                n + 1,
                c + (1 if len(t) >= 2 and re.fullmatch(r"[A-Z]+", t) else 0),
                ti + (1 if re.fullmatch(r"[A-Z][a-z]+", t) else 0),
            )
    got = {
        r.source: r
        for r in QUERIES["text_casing_profile"](spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for src, (n, c, ti) in per.items():
        r = got[src]
        assert (r.n_tokens, r.n_allcaps, r.n_titlecase) == (n, c, ti)
        assert r.caps_micro == _trunc_div(2000000 * c + n, 2 * n)
        assert r.title_micro == _trunc_div(2000000 * ti + n, 2 * n)


def test_rank_stability_matches_python_replay(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_orderdate
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    t0 = min(int(d.timestamp() * 1e6) for d in orders.values())
    t1 = max(int(d.timestamp() * 1e6) for d in orders.values())
    half_us = (t1 - t0) // 2
    rev = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        t = int(orders[r.l_orderkey].timestamp() * 1e6)
        half = 1 if t - t0 >= half_us else 0
        key = (r.l_suppkey, half)
        rev[key] = rev.get(key, 0) + math.floor(
            float(r.l_extendedprice) + 0.5
        )
    ranks = {}
    for half in (0, 1):
        supps = sorted(
            ((d, s) for (s, h), d in rev.items() if h == half),
            key=lambda t: (-t[0], t[1]),
        )
        for i, (_, s) in enumerate(supps, start=1):
            ranks[(s, half)] = i
    common = [
        s for s, h in ranks if h == 0 and (s, 1) in ranks
    ]
    footrule = sum(
        abs(ranks[(s, 0)] - ranks[(s, 1)]) for s in common
    )
    overlap = sum(
        1
        for s in common
        if ranks[(s, 0)] <= 10 and ranks[(s, 1)] <= 10
    )
    n = len(common)
    row = QUERIES["dq_rank_stability"](spark, sf_dir).collect()[0]
    assert (row.n_common, row.footrule) == (n, footrule)
    assert row.footrule_norm_micro == _trunc_div(
        2000000 * footrule + n * n, 2 * n * n
    )
    assert row.top10_overlap == overlap
    assert 0 <= row.top10_overlap <= 10
