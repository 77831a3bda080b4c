"""Semantics tests for the round-44 keys (change point, multi-turn
chat, double charge) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_changepoint_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type != "purchase" or r.value is None:
            continue
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    days = sorted(daily)
    ys = [daily[d] for d in days]
    n, s = len(ys), sum(ys)
    best = None
    st = 0
    for t in range(1, n):
        st += ys[t - 1]
        dev = float(n * st - t * s)
        score = dev * dev / (t * (n - t))
        if best is None or score > best[0]:
            best = (score, t, st)
    score, t, st = best
    row = QUERIES["ts_changepoint_binseg"](spark, sf_dir).collect()[0]
    assert (row.split_day, row.split_t, row.n_days) == (
        days[t - 1], t, n,
    )
    assert abs(row.score - score) < max(1e-4, abs(score) * 1e-9)
    assert row.mean_before_micro == _trunc_div(
        2000000 * st + 100 * t, 200 * t
    )
    assert row.mean_after_micro == _trunc_div(
        2000000 * (s - st) + 100 * (n - t), 200 * (n - t)
    )


def test_chat_multiturn_matches_python_replay(spark, sf_dir):
    ev = sorted(
        (
            (r.user_id, int(r.ts.timestamp() * 1e6), r.event_id,
             r.event_type)
            for r in io.load_events(spark, sf_dir).collect()
        )
    )
    gap = 30 * 60 * 1_000_000
    want = {}
    by_user = {}
    for u, ts, eid, et in ev:
        by_user.setdefault(u, []).append((ts, eid, et))
    for u, rows in by_user.items():
        rows.sort()
        sess_no = 0
        prev = None
        sessions = {}
        for ts, eid, et in rows:
            if prev is None or ts - prev > gap:
                sess_no += 1
            sessions.setdefault(sess_no, []).append((ts, eid, et))
            prev = ts
        for sn, srows in sessions.items():
            turns = []
            for ts, eid, et in srows:
                role = "user" if et in ("view", "click") else "assistant"
                if turns and turns[-1][0] == role:
                    turns[-1][1].append(et)
                else:
                    turns.append((role, [et]))
            transcript = "".join(
                f"<|{role}|>{','.join(ets)}" for role, ets in turns
            )
            a_chars = sum(
                len(",".join(ets))
                for role, ets in turns
                if role == "assistant"
            )
            want[(u, sn)] = (len(turns), transcript, a_chars)
    got = {
        (r.user_id, r.session_no): (
            r.n_turns, r.transcript, r.assistant_chars,
        )
        for r in QUERIES["pipeline_chat_multiturn"](spark, sf_dir).collect()
    }
    assert got == want


def test_double_charge_matches_bruteforce(spark, sf_dir):
    pur = [
        (
            r.user_id,
            math.floor(float(r.value) * 100.0 + 0.5) // 100,
            int(r.ts.timestamp() * 1e6),
            r.event_id,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.event_type == "purchase" and r.value is not None
    ]
    win = 24 * 3600 * 1_000_000
    want = set()
    for i, (u1, d1, t1, e1) in enumerate(pur):
        for u2, d2, t2, e2 in pur:
            if (
                u1 == u2
                and d1 == d2
                and ((t1, e1) < (t2, e2))
                and t2 - t1 <= win
            ):
                want.add((u1, d1, e1, e2, t2 - t1))
    got = {
        (r.user_id, r.dollars, r.first_event, r.second_event, r.gap_us)
        for r in QUERIES["dq_double_charge"](spark, sf_dir).collect()
    }
    assert got == want
