"""Semantics tests for the round-8-batch keys (exact KS drift test,
codegen-compiled DTW) — independent Python re-derivations, not oracle
re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_ks_statistic_matches_python_rederivation(spark, sf_dir):
    """Re-derive the two-sample KS statistic in plain Python (exact
    integer arithmetic) and compare every output column."""
    ev = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.event_type in ("click", "view") and r.value is not None
    ]
    per_x: dict[int, list[int]] = {}
    n_a = n_b = 0
    for r in ev:
        xc = math.floor(r.value * 100.0 + 0.5)
        cnt = per_x.setdefault(xc, [0, 0])
        if r.event_type == "click":
            cnt[0] += 1
            n_a += 1
        else:
            cnt[1] += 1
            n_b += 1
    c_a = c_b = 0
    best = -1
    at = None
    for xc in sorted(per_x):
        c_a += per_x[xc][0]
        c_b += per_x[xc][1]
        d = abs(c_a * n_b - c_b * n_a)
        if d > best:
            best, at = d, xc
    (row,) = QUERIES["dq_ks_test"](spark, sf_dir).collect()
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.d_scaled == best
    assert row.at_cents == at
    assert row.ks == best / (n_a * n_b)
    assert 0.0 <= row.ks <= 1.0


def test_dtw_matches_python_dp_replay(spark, sf_dir):
    """Re-derive every pair's warp distance with a straightforward
    Python DP over the same PAA vectors and compare exactly."""
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        if r.value is None:
            continue
        by_user.setdefault(r.user_id, []).append(r)
    vecs: dict[int, list[int]] = {}
    for uid, evs in by_user.items():
        if len(evs) < 40:
            continue
        evs.sort(key=lambda r: (r.ts, r.event_id))
        xcs = [math.floor(r.value * 100.0 + 0.5) for r in evs[:40]]
        vecs[uid] = [sum(xcs[s * 5 : (s + 1) * 5]) for s in range(8)]

    def dtw(va: list[int], vb: list[int]) -> int:
        d = [[0] * 8 for _ in range(8)]
        for i in range(8):
            for j in range(8):
                c = abs(va[i] - vb[j])
                if i == 0 and j == 0:
                    d[i][j] = c
                elif i == 0:
                    d[i][j] = c + d[0][j - 1]
                elif j == 0:
                    d[i][j] = c + d[i - 1][0]
                else:
                    d[i][j] = c + min(
                        d[i - 1][j], d[i][j - 1], d[i - 1][j - 1]
                    )
        return d[7][7]

    want = {}
    for ua in vecs:
        for ub in vecs:
            if ua < ub and ua // 25 == ub // 25:
                want[(ua, ub)] = dtw(vecs[ua], vecs[ub])
    got = {
        (r.user_a, r.user_b): r.dtw
        for r in QUERIES["ts_dtw_paa"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture produced no eligible DTW pairs"
    # DTW identity sanity: a pair of identical vectors would be 0; all
    # distances are non-negative integers
    assert all(v >= 0 for v in got.values())
