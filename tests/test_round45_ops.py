"""Semantics tests for the round-45 keys (truss support, ID
continuity, Kneser–Ney) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_truss_support_matches_python_replay(spark, sf_dir):
    """Rebuild the near-dup edge list from the registered pair key
    and count triangle support per edge exhaustively."""
    pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hist = {}
    for a, b in pairs:
        sup = len(adj[a] & adj[b])
        hist[sup] = hist.get(sup, 0) + 1
    got = {
        r.support: r.n_edges
        for r in QUERIES["graph_truss_support"](spark, sf_dir).collect()
    }
    assert got == hist
    assert sum(got.values()) == len(pairs)


def test_id_continuity_matches_python_replay(spark, sf_dir):
    per = {}
    for r in io.load_events(spark, sf_dir).collect():
        n, lo, hi = per.get(r.event_type, (0, None, None))
        per[r.event_type] = (
            n + 1,
            r.event_id if lo is None else min(lo, r.event_id),
            r.event_id if hi is None else max(hi, r.event_id),
        )
    got = {
        r.event_type: r
        for r in QUERIES["dq_id_continuity"](spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for et, (n, lo, hi) in per.items():
        r = got[et]
        span = hi - lo + 1
        assert (r.n, r.id_min, r.id_max) == (n, lo, hi)
        assert r.missing_in_span == span - n
        assert r.density_micro == (2000000 * n + span) // (2 * span)
        assert r.missing_in_span >= 0


def test_kneser_ney_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    bg = {}
    for d in docs:
        toks = d.text.split(" ")
        for v, w in zip(toks, toks[1:]):
            bg[(v, w)] = bg.get((v, w), 0) + 1
    cv, n1p_fwd, n1p_bwd = {}, {}, {}
    for (v, w), c in bg.items():
        cv[v] = cv.get(v, 0) + c
        n1p_fwd[v] = n1p_fwd.get(v, 0) + 1
        n1p_bwd[w] = n1p_bwd.get(w, 0) + 1
    n_bi = len(bg)
    head = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {}
    for i, ((v, w), c) in enumerate(head):
        p = max(c - 0.75, 0.0) / cv[v] + (
            0.75 * n1p_fwd[v] / cv[v]
        ) * (n1p_bwd[w] / n_bi)
        want[(v, w)] = (c, math.floor(1e6 * p + 0.5), i + 1)
    got = {
        (r.v, r.w): (r.c, r.p_kn_micro, r.rnk)
        for r in QUERIES["text_lm_kneser_ney"](spark, sf_dir).collect()
    }
    assert got == want
    # probabilities are genuinely probabilities
    assert all(0 < p <= 1_000_000 for _, p, _ in got.values())
