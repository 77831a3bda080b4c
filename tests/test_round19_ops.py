"""Semantics tests for the round-19 breadth keys (session paths, log
parsing, geometric/harmonic means) — independent Python
re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_session_paths_match_python_replay(spark, sf_dir):
    """Replay the 30-min sessionization and first-3-step path fold in
    Python; compare counts and ranks exactly."""
    by_user = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        by_user.setdefault(r.user_id, []).append(r)
    paths = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        sessions = []
        for r in rows:
            if (
                not sessions
                or (r.ts - sessions[-1][-1].ts).total_seconds() > 1800
            ):
                sessions.append([r])
            else:
                sessions[-1].append(r)
        for s in sessions:
            p = ">".join(e.event_type for e in s[:3])
            paths[p] = paths.get(p, 0) + 1
    ranked = sorted(paths, key=lambda p: (-paths[p], p))
    got = {
        r.path: (r.n_sessions, r.rnk)
        for r in QUERIES["recs_session_paths"](spark, sf_dir).collect()
    }
    want = {p: (paths[p], ranked.index(p) + 1) for p in paths}
    assert got == want


def test_log_parse_roundtrip_matches_direct_aggregate(spark, sf_dir):
    """The parsed-from-text aggregate must equal the same aggregate
    computed directly from orders in Python."""
    agg = {}
    for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        status = 200 + (o.o_orderkey % 3) * 100
        n, b, ips = agg.get(status, (0, 0, set()))
        ips.add(o.o_custkey % 256)
        agg[status] = (n + 1, b + o.o_orderkey % 10000, ips)
    got = {
        r.status: (r.n_requests, r.total_bytes, r.n_client_ips)
        for r in QUERIES["scan_log_parse"](spark, sf_dir).collect()
    }
    want = {s: (n, b, len(ips)) for s, (n, b, ips) in agg.items()}
    assert got == want


def test_geo_harmonic_means_match_python_replay(spark, sf_dir):
    """Replay the micro-nat ln sums and reciprocal quanta; also check
    the AM >= GM >= HM inequality on every group."""
    groups = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        if c <= 0:
            continue
        groups.setdefault(r.event_type, []).append(c)
    got = {
        r.event_type: (r.n, r.arith_mean, r.geo_mean, r.harm_mean)
        for r in QUERIES["agg_geo_harmonic_mean"](spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for et, cs in groups.items():
        n = len(cs)
        am = sum(cs) / n
        lnsum = sum(
            math.floor(math.log(c) * 1000000.0 + 0.5) for c in cs
        )
        gm = math.exp(lnsum / n / 1e6)
        hm = n * 1e12 / sum(10**12 // c for c in cs)
        assert got[et][0] == n
        assert abs(got[et][1] - am) < 1e-5
        assert abs(got[et][2] - gm) < 1e-4
        assert abs(got[et][3] - hm) < 1e-4
        assert got[et][1] >= got[et][2] - 1e-6 >= -1e-6
        assert got[et][2] >= got[et][3] - 1e-3
