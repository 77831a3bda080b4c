"""Semantics tests for the round-21 breadth keys (debounced alerts,
length buckets, hapax ratios) — independent Python re-derivations,
not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_alert_debounce_matches_python_replay(spark, sf_dir):
    """Replay crossings, the 30-min burst-head rule, and alert
    numbering in Python."""
    by_type = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        if c > 9000:
            us = int(r.ts.timestamp() * 1_000_000)
            by_type.setdefault(r.event_type, []).append((us, r.event_id, c))
    want = set()
    for et, xs in by_type.items():
        xs.sort()
        alert_no = 0
        prev = None
        for us, eid, c in xs:
            if prev is None or us - prev > 1800 * 1_000_000:
                alert_no += 1
                want.add((et, eid, c, alert_no))
            prev = us
    got = {
        (r.event_type, r.event_id, r.cents, r.alert_no)
        for r in QUERIES["ts_alert_debounce"](spark, sf_dir).collect()
    }
    assert got == want


def test_debounce_suppresses_flapping():
    """Pure-python property: a burst of crossings within the cooldown
    produces exactly one alert."""
    cooldown = 1800 * 1_000_000
    times = [0, 10**6, 2 * 10**6, cooldown + 2 * 10**6 + 1]
    alerts = []
    prev = None
    for t in times:
        if prev is None or t - prev > cooldown:
            alerts.append(t)
        prev = t
    assert alerts == [0, cooldown + 2 * 10**6 + 1]


def test_length_buckets_match_python_replay(spark, sf_dir):
    """Replay bucket assignment and the exact padding-waste math."""
    buckets = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        n = len(d.text.split(" "))
        b = n // 32
        cnt, tot, mx = buckets.get(b, (0, 0, 0))
        buckets[b] = (cnt + 1, tot + n, max(mx, n))
    got = {
        r.bucket_id: (
            r.lo_tokens,
            r.n_docs,
            r.total_tokens,
            r.max_tokens,
            r.pad_tokens,
            r.waste_micro,
        )
        for r in QUERIES["pipeline_length_buckets"](spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for b, (cnt, tot, mx) in buckets.items():
        pad = cnt * mx - tot
        assert got[b] == (
            b * 32,
            cnt,
            tot,
            mx,
            pad,
            pad * 1000000 // (cnt * mx),
        )
    # bucketed waste must beat global padding on any length spread
    total_docs = sum(c for c, _, _ in buckets.values())
    total_toks = sum(t for _, t, _ in buckets.values())
    global_max = max(m for _, _, m in buckets.values())
    global_pad = total_docs * global_max - total_toks
    bucketed_pad = sum(c * m - t for c, t, m in buckets.values())
    assert bucketed_pad <= global_pad


def test_hapax_ratio_matches_python_replay(spark, sf_dir):
    """Replay per-source vocab counts, TTR, and hapax share."""
    vocab = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        v = vocab.setdefault(d.source, {})
        for t in d.text.split(" "):
            v[t] = v.get(t, 0) + 1
    got = {
        r.source: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_micro, r.hapax_micro)
        for r in QUERIES["text_hapax_ratio"](spark, sf_dir).collect()
    }
    assert set(got) == set(vocab)
    for src, v in vocab.items():
        n_tok = sum(v.values())
        n_typ = len(v)
        n_hap = sum(1 for c in v.values() if c == 1)
        assert got[src] == (
            n_tok,
            n_typ,
            n_hap,
            n_typ * 1000000 // n_tok,
            n_hap * 1000000 // n_typ,
        )
