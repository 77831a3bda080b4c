"""Semantics tests for the round-60 keys (Burrows' Delta, selective
risk, feed gaps) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_burrows_delta_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok = {}
    corpus = {}
    for r in docs:
        for t in r.text.split(" "):
            tok.setdefault(r.source, {})
            tok[r.source][t] = tok[r.source].get(t, 0) + 1
            corpus[t] = corpus.get(t, 0) + 1
    topw = sorted(corpus, key=lambda t: (-corpus[t], t))[:30]
    sources = sorted(tok)
    freq = {}
    for s in sources:
        n_tok = sum(tok[s].values())
        for t in topw:
            freq[(s, t)] = math.floor(
                1e6 * tok[s].get(t, 0) / n_tok + 0.5
            )
    zs = {}
    for t in topw:
        vals = [freq[(s, t)] for s in sources]
        k = len(vals)
        sm = sum(vals)
        ss = sum(v * v for v in vals)
        den = math.sqrt(max(k * ss - sm * sm, 1.0))
        for s in sources:
            zs[(s, t)] = math.floor(
                1000.0 * (freq[(s, t)] * k - sm) / den + 0.5
            )
    deltas = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            diffs = [abs(zs[(a, t)] - zs[(b, t)]) for t in topw]
            deltas[(a, b)] = _trunc_div(
                2 * sum(diffs) + len(diffs), 2 * len(diffs)
            )
    head = sorted(deltas, key=lambda p: (deltas[p], p))[:10]
    want = {
        (a, b, deltas[(a, b)], i + 1)
        for i, (a, b) in enumerate(head)
    }
    got = {
        (r.src_a, r.src_b, r.delta_milli, r.rnk)
        for r in QUERIES["text_burrows_delta"](spark, sf_dir).collect()
    }
    assert got == want


def test_selective_risk_matches_python_replay(spark, sf_dir):
    def router(cents):
        for cut, lbl in zip(
            (2000, 4000, 6000, 8000),
            ("view", "click", "signup", "purchase"),
        ):
            if cents < cut:
                return lbl
        return "error"

    pts = []
    for r in io.load_events(spark, sf_dir).collect():
        if r.value is None:
            continue
        cents = math.floor(float(r.value) * 100.0 + 0.5)
        pts.append(
            (
                -abs(cents % 2000 - 1000),
                r.event_id,
                1 if router(cents) == r.event_type else 0,
            )
        )
    pts.sort()
    n = len(pts)
    got = {
        r.coverage_decile: r
        for r in QUERIES["eval_selective_risk"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 11))
    for d in range(1, 11):
        cut = (d * n + 9) // 10
        kept = pts[:cut]
        correct = sum(c for _, _, c in kept)
        r = got[d]
        assert (r.n_kept, r.n_correct) == (len(kept), correct)
        assert r.selective_acc_micro == _trunc_div(
            2000000 * correct + len(kept), 2 * len(kept)
        )


def test_feed_gaps_match_python_replay(spark, sf_dir):
    seqs = {}
    for r in io.load_events(spark, sf_dir).collect():
        seqs.setdefault(r.event_type, []).append(
            (int(r.ts.timestamp() * 1e6), r.event_id)
        )
    got = {
        r.event_type: r
        for r in QUERIES["dq_feed_gaps"](spark, sf_dir).collect()
    }
    assert set(got) == set(seqs)
    for et, rows in seqs.items():
        rows.sort()
        gaps = sorted(
            rows[i][0] - rows[i - 1][0] for i in range(1, len(rows))
        )
        n = len(gaps)
        r = got[et]
        assert r.n_gaps == n
        assert r.max_gap_us == gaps[-1]
        assert r.p99_gap_us == gaps[(99 * n + 99) // 100 - 1]
        assert r.max_gap_us >= r.p99_gap_us
