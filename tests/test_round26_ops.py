"""Semantics tests for the round-26 breadth keys (source overlap,
heavy changers, time-to-convert) — independent Python re-derivations,
not oracle re-runs."""

from __future__ import annotations

import math
from datetime import timedelta

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_source_overlap_matches_python_replay(spark, sf_dir):
    """Replay per-source vocab sets, intersections, and the integer
    Jaccard for every pair."""
    vocab = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        vocab.setdefault(d.source, set()).update(d.text.split(" "))
    want = {}
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            union = len(vocab[a]) + len(vocab[b]) - inter
            want[(a, b)] = (
                len(vocab[a]),
                len(vocab[b]),
                inter,
                inter * 1000000 // union,
            )
    got = {
        (r.src_a, r.src_b): (r.v_a, r.v_b, r.n_inter, r.jaccard_micro)
        for r in QUERIES["corpus_source_overlap"](spark, sf_dir).collect()
    }
    assert got == want


def test_source_overlap_is_symmetric_definition(spark, sf_dir):
    """Each unordered pair appears exactly once with src_a < src_b."""
    rows = QUERIES["corpus_source_overlap"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert 0 < r.jaccard_micro <= 1000000


def test_heavy_changers_match_python_replay(spark, sf_dir):
    """Replay per-user half deltas and the top-10 |delta| ranking."""
    rows = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.value is not None
    ]
    days = [r.ts.date() for r in rows]
    lo, hi = min(days), max(days)
    mid = lo + timedelta(days=(hi - lo).days // 2)
    per_user = {}
    for r in rows:
        c = math.floor(float(r.value) * 100.0 + 0.5)
        a, b = per_user.get(r.user_id, (0, 0))
        if r.ts.date() <= mid:
            a += c
        else:
            b += c
        per_user[r.user_id] = (a, b)
    ranked = sorted(
        per_user, key=lambda u: (-abs(per_user[u][1] - per_user[u][0]), u)
    )[:10]
    want = {
        u: (
            per_user[u][0],
            per_user[u][1],
            per_user[u][1] - per_user[u][0],
            i + 1,
        )
        for i, u in enumerate(ranked)
    }
    got = {
        r.user_id: (r.a_cents, r.b_cents, r.delta, r.rnk)
        for r in QUERIES["dq_heavy_changers"](spark, sf_dir).collect()
    }
    assert got == want


def test_time_to_convert_matches_python_replay(spark, sf_dir):
    """Replay first-view/first-buy per user and the nearest-rank
    median/p90 selection."""
    firsts = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        us = int(r.ts.timestamp() * 1_000_000)
        fv, fb = firsts.get(r.user_id, (None, None))
        if r.event_type == "view" and (fv is None or us < fv):
            fv = us
        if r.event_type == "purchase" and (fb is None or us < fb):
            fb = us
        firsts[r.user_id] = (fv, fb)
    hours = sorted(
        (fb - fv) // 3_600_000_000
        for fv, fb in firsts.values()
        if fv is not None and fb is not None and fb >= fv
    )
    n = len(hours)
    (row,) = QUERIES["ts_time_to_convert"](spark, sf_dir).collect()
    assert row.n_converters == n
    assert row.median_hours == hours[(n + 1) // 2 - 1]
    assert row.p90_hours == hours[(9 * n + 9) // 10 - 1]
    assert row.min_hours == hours[0]
    assert row.max_hours == hours[-1]
    assert row.min_hours <= row.median_hours <= row.p90_hours <= row.max_hours
