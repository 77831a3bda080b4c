"""Semantics tests for the round-24 breadth keys (chi2 goodness,
metric decomposition, Poisson rates) — independent Python
re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_chi2_goodness_matches_python_replay(spark, sf_dir):
    counts = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        counts[r.event_type] = counts.get(r.event_type, 0) + 1
    total = sum(counts.values())
    k = len(counts)
    exp = total / k
    got = {
        r.event_type: (r.observed, r.expected, r.chi2_term, r.dof)
        for r in QUERIES["dq_chi2_goodness"](spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for et, n in counts.items():
        assert got[et][0] == n
        assert abs(got[et][1] - exp) < 1e-5
        assert abs(got[et][2] - (n - exp) ** 2 / exp) < 1e-5
        assert got[et][3] == k - 1


def test_metric_decompose_matches_and_has_no_residual(spark, sf_dir):
    """Replay the decomposition; the defining identity: rate_effect +
    value_effect == rpu1 - rpu0 with NO residual (midpoint weights)."""
    per_user = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        cents, conv = per_user.get(r.user_id, (0, 0))
        if r.event_type == "purchase":
            per_user[r.user_id] = (cents + c, 1)
        else:
            per_user[r.user_id] = (cents, conv)
    stats = {}
    for v in (0, 1):
        grp = [cv for uid, cv in per_user.items() if uid % 2 == v]
        n = len(grp)
        n_conv = sum(c for _, c in grp)
        cents = sum(x for x, _ in grp)
        stats[v] = (n, n_conv / n, cents / n_conv, cents / n)
    (row,) = QUERIES["ab_metric_decompose"](spark, sf_dir).collect()
    assert (row.n0, row.n1) == (stats[0][0], stats[1][0])
    for got, want in (
        (row.conv0, stats[0][1]),
        (row.conv1, stats[1][1]),
        (row.vpc0, stats[0][2]),
        (row.vpc1, stats[1][2]),
        (row.rpu0, stats[0][3]),
        (row.rpu1, stats[1][3]),
    ):
        assert abs(got - want) < 1e-5
    rate_eff = (stats[1][1] - stats[0][1]) * (stats[0][2] + stats[1][2]) / 2
    value_eff = (stats[1][2] - stats[0][2]) * (stats[0][1] + stats[1][1]) / 2
    assert abs(row.rate_effect - rate_eff) < 1e-5
    assert abs(row.value_effect - value_eff) < 1e-5
    # the exact two-factor identity (no residual)
    assert abs(
        (row.rate_effect + row.value_effect) - (row.rpu1 - row.rpu0)
    ) < 1e-4


def test_poisson_rate_matches_python_replay(spark, sf_dir):
    users = {0: set(), 1: set()}
    events = {0: 0, 1: 0}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        v = r.user_id % 2
        users[v].add(r.user_id)
        events[v] += 1
    r0 = events[0] / len(users[0])
    r1 = events[1] / len(users[1])
    z = math.log(r1 / r0) / math.sqrt(1 / events[0] + 1 / events[1])
    (row,) = QUERIES["ab_poisson_rate"](spark, sf_dir).collect()
    assert (row.u0, row.u1, row.e0, row.e1) == (
        len(users[0]),
        len(users[1]),
        events[0],
        events[1],
    )
    assert abs(row.rate0 - r0) < 1e-5
    assert abs(row.rate1 - r1) < 1e-5
    assert abs(row.z_stat - z) < 1e-5
    assert row.significant == (abs(z) > 1.96)
