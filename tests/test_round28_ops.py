"""Semantics tests for the round-28 breadth keys (WOE/IV, DFT power,
DSIR selection) — independent Python re-derivations, not oracle
re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_woe_iv_matches_python_replay(spark, sf_dir):
    """Replay the per-segment label counts and the smoothed WOE/IV
    formulas."""
    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    good, bad = {}, {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        s = seg_of[r.o_custkey]
        if r.o_orderstatus == "F":
            good[s] = good.get(s, 0) + 1
            bad.setdefault(s, 0)
        else:
            bad[s] = bad.get(s, 0) + 1
            good.setdefault(s, 0)
    G = sum(g + 0.5 for g in good.values())
    B = sum(b + 0.5 for b in bad.values())
    rows = QUERIES["feat_woe_iv"](spark, sf_dir).collect()
    assert [r.segment for r in rows] == sorted(good)
    for r in rows:
        assert r.n_good == good[r.segment]
        assert r.n_bad == bad[r.segment]
        dg = (good[r.segment] + 0.5) / G
        db = (bad[r.segment] + 0.5) / B
        woe = math.log(dg / db)
        assert abs(r.woe - woe) < 1e-5
        assert abs(r.iv_term - (dg - db) * woe) < 1e-5


def test_woe_iv_sign_convention():
    """Pure-formula property: a segment over-represented among good
    labels gets positive WOE and a POSITIVE IV contribution either
    way (IV terms are (dg-db)*ln(dg/db) >= 0)."""
    for dg, db in ((0.4, 0.1), (0.1, 0.4), (0.25, 0.25)):
        woe = math.log(dg / db)
        assert (woe > 0) == (dg > db)
        assert (dg - db) * woe >= 0.0


def test_dft_power_matches_python_replay(spark, sf_dir):
    """Replay the centered daily series and the micro-rounded
    harmonic sums."""
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + 1
    days = sorted(daily)
    dmin, n_span = days[0], (days[-1] - days[0]).days + 1
    d_obs, s = len(days), sum(daily.values())
    pw = {}
    for k in range(1, 9):
        sc = ss = 0
        for d in days:
            t = (d - dmin).days
            xc = daily[d] * d_obs - s
            ang = (6.283185307179586 * (k * t)) / n_span
            sc += xc * math.floor(math.cos(ang) * 1e6 + 0.5)
            ss += xc * math.floor(math.sin(ang) * 1e6 + 0.5)
        pw[k] = float(sc) * sc + float(ss) * ss
    tot = sum(pw.values())
    rows = QUERIES["ts_dft_power"](spark, sf_dir).collect()
    assert sorted(r.k for r in rows) == list(range(1, 9))
    for r in rows:
        assert abs(r.period_days - n_span / r.k) < 1e-3
        assert abs(r.power_rel - pw[r.k] / tot) < 1e-5
    # relative powers are a distribution over the 8 harmonics
    assert abs(sum(r.power_rel for r in rows) - 1.0) < 1e-4


def test_dsir_select_matches_python_replay(spark, sf_dir):
    """Replay both unigram LMs, the micro-nat token weights, and the
    top-100 admission ranking."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    c_raw, c_tgt = {}, {}
    for d, toks in docs.items():
        for t in toks:
            c_raw[t] = c_raw.get(t, 0) + 1
            if d % 7 == 0:
                c_tgt[t] = c_tgt.get(t, 0) + 1
    v = len(c_raw)
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    w = {
        t: math.floor(
            1e6
            * math.log(
                ((c_tgt.get(t, 0) + 0.5) / (n_tgt + 0.5 * v))
                / ((c_raw[t] + 0.5) / (n_raw + 0.5 * v))
            )
            + 0.5
        )
        for t in c_raw
    }
    scores = {d: sum(w[t] for t in toks) for d, toks in docs.items()}
    ranked = sorted(scores, key=lambda d: (-scores[d], d))[:100]
    want = {
        (d, scores[d], len(docs[d]), i + 1) for i, d in enumerate(ranked)
    }
    got = {
        (r.doc_id, r.score_micro, r.n_tokens, r.rnk)
        for r in QUERIES["corpus_dsir_select"](spark, sf_dir).collect()
    }
    assert got == want


def test_dsir_seed_docs_score_high(spark, sf_dir):
    """Direction check: the curated seed docs define the target, so
    their average score must beat the non-seed average (the selection
    pulls toward the target distribution)."""
    rows = QUERIES["corpus_dsir_select"](spark, sf_dir).collect()
    # with 500 docs and a top-100 cut, seed docs (1 in 7) should be
    # over-represented among admitted rows vs their base rate
    seed_frac = sum(1 for r in rows if r.doc_id % 7 == 0) / len(rows)
    assert seed_frac > 1.0 / 7.0
