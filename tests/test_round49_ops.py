"""Semantics tests for the round-49 keys (transitivity, zstd codec,
TOST) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_transitivity_matches_python_replay(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    pairs = set()
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        pairs.add((orders[r.l_orderkey] * 2, r.l_suppkey * 2 + 1))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    tri = 0
    fwd = sorted(
        {(min(a, b), max(a, b)) for a, b in pairs}
    )
    fset = set(fwd)
    for a, b in fwd:
        for c in adj[b]:
            if c > b and (a, c) in fset and (b, c) in fset:
                tri += 1
    row = QUERIES["graph_transitivity"](spark, sf_dir).collect()[0]
    assert (row.n_wedges, row.n_triangles) == (wedges, tri)
    # bipartite: triangles impossible
    assert row.n_triangles == 0
    assert row.transitivity_micro == (
        (2000000 * 3 * tri + wedges) // (2 * wedges) if wedges else None
    )


def test_zstd_codec_roundtrip(spark, sf_dir):
    per = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        n, s = per.get(r.o_orderstatus, (0, 0))
        per[r.o_orderstatus] = (
            n + 1,
            s + math.floor(float(r.o_totalprice) * 100.0 + 0.5),
        )
    got = {
        r.o_orderstatus: (r.n, r.cents_sum)
        for r in QUERIES["sink_zstd_codec"](spark, sf_dir).collect()
    }
    assert got == per


def test_tost_matches_python_replay(spark, sf_dir):
    arms = {0: [0, 0, 0], 1: [0, 0, 0]}
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        a = arms[r.user_id % 2]
        a[0] += 1
        a[1] += c
        a[2] += c * c
    (n_c, s_c, ss_c), (n_t, s_t, ss_t) = arms[0], arms[1]
    diff = s_t / n_t / 100.0 - s_c / n_c / 100.0
    se = math.sqrt(
        (
            (ss_t * n_t - s_t * s_t) / (n_t * n_t * (n_t - 1))
            + (ss_c * n_c - s_c * s_c) / (n_c * n_c * (n_c - 1))
        )
        / 10000.0
    )
    z = 1.6448536269514722
    t_lo = (diff + 0.02) / se
    t_hi = (0.02 - diff) / se
    row = QUERIES["ab_tost_equivalence"](spark, sf_dir).collect()[0]
    assert (row.n_treat, row.n_control) == (n_t, n_c)
    assert abs(row.diff_dollars - diff) < 1e-5
    assert abs(row.se_dollars - se) < 1e-5
    assert abs(row.t_lower - t_lo) < 1e-3
    assert abs(row.t_upper - t_hi) < 1e-3
    assert row.equivalent == (1 if t_lo > z and t_hi > z else 0)
    # hash-split arms of the same population should be equivalent
    # whenever the sample is large enough for the margin
    if se * z < 0.015:
        assert row.equivalent == 1
