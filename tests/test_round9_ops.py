"""Semantics tests for the round-8/9-batch keys (exact KS drift test,
codegen-compiled DTW, prefix-filtered set-similarity join, hybrid skew
join, Hilbert layout) — independent Python re-derivations, not oracle
re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.queries.breadth_round9 import (
    _HB_N,
    _HB_TABLE,
    hilbert_xy2d,
)
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


def _bigrams(text: str) -> frozenset:
    toks = text.split(" ")
    return frozenset(
        f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
    )


def test_ppjoin_no_false_negatives_vs_brute_force(spark):
    """The prefix-collision guarantee is a theorem; prove it holds on
    the fixture by brute-forcing ALL pairs at sf0.001 and comparing the
    exact survivor set (pairs AND counts) with the query's output."""
    sf = "/root/testdata/sf0.001"
    docs = {
        r.doc_id: _bigrams(r.text)
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    want = {}
    ids = sorted(docs)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            a, b = docs[da], docs[db]
            if not a or not b:
                continue
            inter = len(a & b)
            uni = len(a | b)
            if 10 * inter >= 7 * uni:
                want[(da, db)] = (inter, uni)
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.uni)
        for r in QUERIES["dedup_ppjoin"](spark, sf).collect()
    }
    assert got == want
    for r in QUERIES["dedup_ppjoin"](spark, sf).collect():
        assert r.jaccard == r.inter / r.uni >= 0.7


def test_skew_hybrid_equals_plain_join_and_has_both_branches(spark, sf_dir):
    """The hybrid's values must equal the plain join's, and its physical
    plan must actually contain BOTH a broadcast branch and a shuffle
    branch (otherwise it is not a hybrid)."""
    from pyspark.sql import functions as F

    df = QUERIES["join_skew_hybrid"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "value"
    )
    dim = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_user"),
        F.sum(F.col("value").cast("decimal(28,2)"))
        .cast("decimal(38,2)")
        .alias("v_user"),
    )
    plain = (
        ev.join(dim, "user_id")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_user").cast("long").alias("sum_user_n"),
            F.sum("v_user").cast("double").alias("total_dim_value"),
        )
    )
    got = {r.event_type: (r.n, r.sum_user_n, r.total_dim_value)
           for r in df.collect()}
    want = {r.event_type: (r.n, r.sum_user_n, r.total_dim_value)
            for r in plain.collect()}
    assert got == want


def test_hilbert_table_is_a_unit_step_space_filling_curve():
    """The defining Hilbert properties: xy2d is a bijection onto
    0..255, and consecutive curve positions are GRID-ADJACENT (unit
    Manhattan step) — this kills any wrong rotation/flip variant."""
    assert sorted(_HB_TABLE) == list(range(_HB_N * _HB_N))
    pos = {}
    for x in range(_HB_N):
        for y in range(_HB_N):
            pos[hilbert_xy2d(x, y)] = (x, y)
    for d in range(_HB_N * _HB_N - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_cells_match_python_replay(spark, sf_dir):
    """Replay the binning + table lookup + per-cell stats in Python."""
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cells = {}
    for r in rows:
        if r.value is None:
            continue
        cents = math.floor(r.value * 100.0 + 0.5)
        h = _HB_TABLE[(r.user_id % _HB_N) * _HB_N + (cents % _HB_N)]
        c = cells.setdefault(h // 16, [0, None, None, None, None])
        c[0] += 1
        c[1] = r.user_id if c[1] is None else min(c[1], r.user_id)
        c[2] = r.user_id if c[2] is None else max(c[2], r.user_id)
        c[3] = cents if c[3] is None else min(c[3], cents)
        c[4] = cents if c[4] is None else max(c[4], cents)
    got = {
        r.h_cell: [r.n, r.user_lo, r.user_hi, r.cents_lo, r.cents_hi]
        for r in QUERIES["layout_hilbert"](spark, sf_dir).collect()
    }
    assert got == cells
