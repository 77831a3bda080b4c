"""Semantics tests for the round-55 keys (SPRT, Page–Hinkley,
Bayesian posterior) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()

_UP, _DN, _B = 510826, -125163, 2944439


def test_sprt_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type not in ("purchase", "view"):
            continue
        d = r.ts.date()
        inc, n = daily.get(d, (0, 0))
        daily[d] = (
            inc + (_UP if r.event_type == "purchase" else _DN),
            n + 1,
        )
    days = sorted(daily)
    llr = n_obs = 0
    crossing = None
    for d in days:
        llr += daily[d][0]
        n_obs += daily[d][1]
        if crossing is None and abs(llr) >= _B:
            crossing = (d, llr)
    row = QUERIES["ab_sprt_boundary"](spark, sf_dir).collect()[0]
    assert row.final_day == days[-1]
    assert row.final_llr_micro == llr
    assert row.n_obs == n_obs
    if crossing is None:
        assert row.first_crossing_day is None
        assert row.decision == 0
    else:
        assert row.first_crossing_day == crossing[0]
        assert row.crossing_llr_micro == crossing[1]
        assert row.decision == (1 if crossing[1] >= _B else -1)


def test_page_hinkley_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        d = r.ts.date()
        if r.event_type == "purchase":
            daily[d] = daily.get(d, 0) + math.floor(
                float(r.value) + 0.5
            )
        else:
            daily.setdefault(d, 0)
    days = sorted(daily)
    s = 0
    m = 0
    m_min = 0
    max_ph = 0
    alarm = None
    lam = 50000.0 * 1e6
    for t, d in enumerate(days, start=1):
        s += daily[d]
        term = math.floor(
            1e6 * (daily[d] - s / t - 500.0) + 0.5
        )
        m += term
        m_min = min(m_min, m) if t > 1 else m
        ph = m - m_min
        max_ph = max(max_ph, ph)
        if alarm is None and ph > lam:
            alarm = (d, ph)
    row = QUERIES["ts_page_hinkley"](spark, sf_dir).collect()[0]
    assert row.n_days == len(days)
    assert row.max_ph_micro == max_ph
    if alarm is None:
        assert row.first_alarm_day is None
    else:
        assert (row.first_alarm_day, row.alarm_ph_micro) == alarm
    assert row.max_ph_micro >= 0


def test_bayes_posterior_matches_python_replay(spark, sf_dir):
    arms = {0: [0, 0], 1: [0, 0]}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type not in ("purchase", "view"):
            continue
        a = arms[r.user_id % 2]
        a[0] += 1
        a[1] += r.event_type == "purchase"
    stats = {}
    for arm, (n, c) in arms.items():
        mu = (c + 1) / (n + 2)
        var = mu * ((n - c + 1) / (n + 2)) / (n + 3)
        stats[arm] = (n, c + 1, n - c + 1, mu, var)
    z = (stats[1][3] - stats[0][3]) / math.sqrt(
        stats[1][4] + stats[0][4]
    )
    rows = {
        r.arm: r
        for r in QUERIES["ab_bayes_posterior"](spark, sf_dir).collect()
    }
    for arm, (n, a, b, mu, var) in stats.items():
        r = rows[arm]
        assert (r.n, r.post_alpha, r.post_beta) == (n, a, b)
        assert r.mean_micro == math.floor(1e6 * mu + 0.5)
        assert abs(r.sd - math.sqrt(var)) < 1e-6
        assert abs(r.z_t_gt_c - z) < 1e-3
