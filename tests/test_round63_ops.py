"""Semantics tests for the round-63 keys (seasonal strength, win
matrix, price endings) — independent Python re-derivations."""

from __future__ import annotations

import math
from datetime import date

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_seasonal_strength_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        ed = (r.ts.date() - epoch).days
        daily[ed] = daily.get(ed, 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    n_all = len(daily)
    mu_n = sum(daily.values())
    dow_stats = {}
    for ed, c in daily.items():
        s, n = dow_stats.get(ed % 7, (0, 0))
        dow_stats[ed % 7] = (s + c, n + 1)
    var_resid = 0.0
    var_total = 0.0
    for ed, c in daily.items():
        s, n = dow_stats[ed % 7]
        rn = c * n - s
        var_resid += float(rn) * rn / (n * n)
        var_total += (c - mu_n / n_all) ** 2
    row = QUERIES["ts_seasonal_strength"](spark, sf_dir).collect()[0]
    assert row.n_days == n_all
    assert abs(row.var_resid - var_resid / n_all) < max(
        1e-3, abs(var_resid / n_all) * 1e-9
    )
    strength = max(1.0 - var_resid / var_total, 0.0)
    assert abs(row.seasonal_strength - strength) < 1e-5
    assert 0.0 <= row.seasonal_strength <= 1.0


def test_win_matrix_matches_python_replay(spark, sf_dir):
    ev = sorted(
        (
            (r.user_id, int(r.ts.timestamp() * 1e6), r.event_id,
             r.event_type, math.floor(float(r.value) * 100.0 + 0.5))
            for r in io.load_events(spark, sf_dir).collect()
            if r.value is not None
        )
    )
    cells = {}
    prev = {}
    for u, _, _, et, cents in ev:
        if u in prev:
            pt, pc = prev[u]
            if et != pt:
                if cents > pc:
                    w_, l_ = et, pt
                elif cents < pc:
                    w_, l_ = pt, et
                else:
                    w_, l_ = min(et, pt), max(et, pt)
                a, b = min(w_, l_), max(w_, l_)
                wa, wb = cells.get((a, b), (0, 0))
                if w_ == a:
                    wa += 1
                else:
                    wb += 1
                cells[(a, b)] = (wa, wb)
        prev[u] = (et, cents)
    got = {
        (r.model_a, r.model_b): (r.wins_a, r.wins_b, r.winrate_a_micro)
        for r in QUERIES["eval_win_matrix"](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for k, (wa, wb) in cells.items():
        g = got[k]
        assert (g[0], g[1]) == (wa, wb)
        assert g[2] == _trunc_div(
            2000000 * wa + wa + wb, 2 * (wa + wb)
        )


def test_price_endings_match_python_replay(spark, sf_dir):
    endings = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        e = math.floor(float(r.o_totalprice) * 100.0 + 0.5) % 100
        endings[e] = endings.get(e, 0) + 1
    total = sum(endings.values())
    head = sorted(endings.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {
        (e, n, _trunc_div(2000000 * n + total, 2 * total), i + 1)
        for i, (e, n) in enumerate(head)
    }
    got = {
        (r.cent_ending, r.n, r.share_micro, r.rnk)
        for r in QUERIES["agg_price_endings"](spark, sf_dir).collect()
    }
    assert got == want
