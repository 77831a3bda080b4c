"""Semantics tests for the round-27 breadth keys (Adamic–Adar, global
shuffle, rolling correlation) — independent Python re-derivations, not
oracle re-runs."""

from __future__ import annotations

import hashlib
import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_adamic_adar_matches_python_replay(spark, sf_dir):
    """Replay supplier customer-lists, micro AA weights, and the
    top-20 pair ranking."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    supp_cust = {}
    for r in li:
        supp_cust.setdefault(r.l_suppkey * 2 + 1, set()).add(
            orders[r.l_orderkey] * 2
        )
    scores = {}
    shared = {}
    for s, custs in supp_cust.items():
        d = len(custs)
        if d < 2:
            continue
        wm = math.floor(1000000.0 / math.log(d) + 0.5)
        cl = sorted(custs)
        for i, ca in enumerate(cl):
            for cb in cl[i + 1 :]:
                scores[(ca, cb)] = scores.get((ca, cb), 0) + wm
                shared[(ca, cb)] = shared.get((ca, cb), 0) + 1
    ranked = sorted(scores, key=lambda p: (-scores[p], p))[:20]
    want = {
        (a, b, shared[(a, b)], scores[(a, b)], i + 1)
        for i, (a, b) in enumerate(ranked)
    }
    got = {
        (r.cust_a, r.cust_b, r.n_shared, r.aa_micro, r.rnk)
        for r in QUERIES["graph_adamic_adar"](spark, sf_dir).collect()
    }
    assert got == want


def test_adamic_adar_downweights_hubs():
    """Pure-formula property: a shared low-degree supplier contributes
    more than a shared hub."""
    w = lambda d: math.floor(1e6 / math.log(d) + 0.5)
    assert w(2) > w(10) > w(1000)


def test_global_shuffle_matches_python_replay(spark, sf_dir):
    """Replay md5 ranks, shard assignment, and in-shard positions."""
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    hv = {
        d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        for d in docs
    }
    want = {}
    for shard in range(8):
        members = sorted(
            (d for d in docs if hv[d] % 8 == shard),
            key=lambda d: (hv[d], d),
        )
        for pos, d in enumerate(members, start=1):
            want[d] = (shard, pos)
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in QUERIES["pipeline_global_shuffle"](spark, sf_dir).collect()
    }
    assert got == want
    # positions are a dense 1..n numbering per shard (resumable cursor)
    for shard in range(8):
        poss = sorted(p for s, p in got.values() if s == shard)
        assert poss == list(range(1, len(poss) + 1))


def test_rolling_corr_matches_python_replay(spark, sf_dir):
    """Replay the daily (x, y) series and the 7-row moment windows."""
    daily = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        x, y = daily.get(r.ts.date(), (0, 0))
        if r.event_type == "view":
            x += c
        elif r.event_type == "purchase":
            y += c
        daily[r.ts.date()] = (x, y)
    days = sorted(daily)
    got = {
        r.day: (r.n_window, r.corr)
        for r in QUERIES["win_rolling_corr"](spark, sf_dir).collect()
    }
    assert set(got) == set(days)
    for i, day in enumerate(days):
        frame = [daily[d] for d in days[max(0, i - 6) : i + 1]]
        n = len(frame)
        sx = sum(x for x, _ in frame)
        sy = sum(y for _, y in frame)
        sxx = sum(x * x for x, _ in frame)
        syy = sum(y * y for _, y in frame)
        sxy = sum(x * y for x, y in frame)
        assert got[day][0] == n
        if n >= 3 and n * sxx > sx * sx and n * syy > sy * sy:
            corr = (n * sxy - sx * sy) / math.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            assert abs(got[day][1] - corr) < 1e-5
            assert -1.0 - 1e-9 <= got[day][1] <= 1.0 + 1e-9
        else:
            assert got[day][1] is None
