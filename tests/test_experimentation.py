"""Semantics tests for the experimentation keys (Welch t-test, SRM
gate, CUPED) — independent Python re-derivations via exact moment
replays, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _user_metrics(spark, sf_dir):
    per_user = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        y, x, tot = per_user.get(r.user_id, (0, 0, 0))
        per_user[r.user_id] = (
            y + (c if r.event_type == "purchase" else 0),
            x + (c if r.event_type == "view" else 0),
            tot + c,
        )
    return per_user


def test_welch_ttest_matches_python_replay(spark, sf_dir):
    """Replay the per-user totals, the exact moment sums, and the
    Welch t / Satterthwaite df in Python."""
    per_user = _user_metrics(spark, sf_dir)
    groups = {0: [], 1: []}
    for uid, (_, _, tot) in per_user.items():
        groups[uid % 2].append(tot)
    n0, n1 = len(groups[0]), len(groups[1])
    m0 = sum(groups[0]) / n0
    m1 = sum(groups[1]) / n1

    def svar(vals):
        n, s, s2 = len(vals), sum(vals), sum(v * v for v in vals)
        return (n * s2 - s * s) / (n * (n - 1))

    v0, v1 = svar(groups[0]), svar(groups[1])
    se2 = v0 / n0 + v1 / n1
    t = (m1 - m0) / math.sqrt(se2)
    df = se2**2 / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    (row,) = QUERIES["ab_welch_ttest"](spark, sf_dir).collect()
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.mean0 - m0) < 1e-5 and abs(row.mean1 - m1) < 1e-5
    assert abs(row.t_stat - t) < 1e-5
    assert abs(row.df - df) < 1e-3
    assert row.significant == (abs(t) > 1.96)


def test_srm_matches_python_replay(spark, sf_dir):
    """Replay the distinct-user variant counts and the 1-df chi2."""
    users = {
        r.user_id
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    }
    n0 = sum(1 for u in users if u % 2 == 0)
    n1 = len(users) - n0
    half = (n0 + n1) / 2.0
    chi2 = (n0 - half) ** 2 / half + (n1 - half) ** 2 / half
    (row,) = QUERIES["ab_srm_check"](spark, sf_dir).collect()
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.chi2 - chi2) < 1e-6
    assert row.srm_flag == (chi2 > 3.841)


def test_cuped_matches_python_replay_and_preserves_effect(spark, sf_dir):
    """Replay θ, ρ, and the per-variant adjusted means in Python; the
    CUPED-adjusted lift must equal the raw lift up to θ times the
    covariate imbalance (linearity), and var_ratio = 1 - ρ²."""
    per_user = _user_metrics(spark, sf_dir)
    xs = [x for (_, x, _) in per_user.values()]
    ys = [y for (y, _, _) in per_user.values()]
    n = len(per_user)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(x * y for (y, x, _) in per_user.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    mx = sx / n
    rows = {r.variant: r for r in QUERIES["ab_cuped_adjust"](spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    for v in (0, 1):
        grp = [(y, x) for uid, (y, x, _) in per_user.items() if uid % 2 == v]
        nv = len(grp)
        my = sum(y for y, _ in grp) / nv
        mxv = sum(x for _, x in grp) / nv
        assert rows[v].n == nv
        assert abs(rows[v].mean_y - my) < 1e-5
        assert abs(rows[v].mean_y_cuped - (my - theta * (mxv - mx))) < 1e-5
        assert abs(rows[v].theta - theta) < 1e-5
        assert abs(rows[v].var_ratio - (1 - rho * rho)) < 1e-5


def test_cuped_variance_reduction_is_real():
    """Pure-python property: on correlated (x, y) data the residualized
    metric really has variance * (1-ρ²) — the formula the key reports."""
    xs = list(range(100))
    ys = [3 * x + ((x * 37) % 11) for x in xs]  # strong linear + noise
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    vx = sum((x - mx) ** 2 for x in xs) / n
    vy = sum((y - my) ** 2 for y in ys) / n
    theta = cov / vx
    resid = [y - theta * (x - mx) for x, y in zip(xs, ys)]
    mr = sum(resid) / n
    vr = sum((r - mr) ** 2 for r in resid) / n
    rho2 = cov * cov / (vx * vy)
    assert abs(vr / vy - (1 - rho2)) < 1e-9
    assert vr < 0.1 * vy  # the boost is large on this fixture
