"""Semantics tests for the round-30 breadth keys (Bradley–Terry,
forward as-of with tolerance, RSI) — independent Python
re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_bradley_terry_matches_python_replay(spark, sf_dir):
    """Replay match construction and the pinned MM trajectory."""
    ev = sorted(
        (
            (r.user_id, int(r.ts.timestamp() * 1e6), r.event_id,
             r.event_type, math.floor(float(r.value) * 100.0 + 0.5))
            for r in io.load_events(spark, sf_dir).collect()
            if r.value is not None
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    matches = []
    prev = {}
    for u, _, _, et, cents in ev:
        if u in prev:
            pt, pc = prev[u]
            if et != pt:
                if cents > pc:
                    matches.append((et, pt))
                elif cents < pc:
                    matches.append((pt, et))
                else:
                    matches.append((min(et, pt), max(et, pt)))
        prev[u] = (et, cents)
    wins, played = {}, {}
    pair_n = {}
    for w_, l_ in matches:
        wins[w_] = wins.get(w_, 0) + 1
        wins.setdefault(l_, 0)
        played[w_] = played.get(w_, 0) + 1
        played[l_] = played.get(l_, 0) + 1
        key = (min(w_, l_), max(w_, l_))
        pair_n[key] = pair_n.get(key, 0) + 1
    items = sorted(wins)
    theta = {i: 1.0 / len(items) for i in items}
    for _ in range(3):
        den = {i: 0 for i in items}
        for (a, b), n in pair_n.items():
            cm = math.floor(1e6 * n / (theta[a] + theta[b]) + 0.5)
            den[a] += cm
            den[b] += cm
        t_nano = {
            i: math.floor(1e9 * (wins[i] / (den[i] / 1e6)) + 0.5)
            for i in items
        }
        tot = float(sum(t_nano.values()))
        theta = {i: t_nano[i] / tot for i in items}
    rows = {
        r.event_type: r
        for r in QUERIES["eval_bradley_terry"](spark, sf_dir).collect()
    }
    assert set(rows) == set(items)
    ranked = sorted(items, key=lambda i: (-theta[i], i))
    for i in items:
        r = rows[i]
        assert abs(r.rating - theta[i]) < 1e-5
        assert r.n_wins == wins[i]
        assert r.n_matches == played[i]
        assert r.rnk == ranked.index(i) + 1
    # ratings are a normalized strength distribution
    assert abs(sum(r.rating for r in rows.values()) - 1.0) < 1e-4


def test_asof_tolerance_matches_bruteforce(spark, sf_dir):
    """Brute-force the earliest in-window event per order."""
    tol = 7 * 86400 * 1_000_000
    ev = [
        (r.user_id, int(r.ts.timestamp() * 1e6), r.event_id)
        for r in io.load_events(spark, sf_dir).collect()
    ]
    want = {}
    for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        if o.o_orderkey % 100 != 0:
            continue
        o_us = int(o.o_orderdate.timestamp() * 1e6)
        cand = [
            (ts, eid)
            for u, ts, eid in ev
            if u == o.o_custkey % 20 and o_us <= ts <= o_us + tol
        ]
        want[o.o_orderkey] = min(cand) if cand else None
    got = {
        r.o_orderkey: (
            None
            if r.next_event_id is None
            else (
                int(r.next_event_ts.timestamp() * 1e6),
                r.next_event_id,
            )
        )
        for r in QUERIES["join_asof_tolerance"](spark, sf_dir).collect()
    }
    assert got == want
    # left join: every selected order appears exactly once
    assert len(got) == len(want)


def test_rsi_matches_python_replay(spark, sf_dir):
    """Replay daily deltas and the 14-delta trailing sums."""
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type != "purchase" or r.value is None:
            continue
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    days = sorted(daily)
    deltas = [None] + [
        daily[days[i]] - daily[days[i - 1]] for i in range(1, len(days))
    ]
    got = {
        r.day: r for r in QUERIES["win_rsi"](spark, sf_dir).collect()
    }
    assert set(got) == set(days)
    for i, day in enumerate(days):
        frame = [d for d in deltas[max(0, i - 13) : i + 1] if d is not None]
        gain = sum(d for d in frame if d > 0)
        loss = sum(-d for d in frame if d < 0)
        r = got[day]
        assert (r.gain_cents, r.loss_cents) == (gain, loss)
        if len(frame) == 14 and gain + loss > 0:
            assert abs(r.rsi - 100.0 * gain / (gain + loss)) < 1e-3
            assert 0.0 <= r.rsi <= 100.0
        else:
            assert r.rsi is None
