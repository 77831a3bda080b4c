"""Semantics tests for the round-47 keys (Lorenz deciles, DOW
profile, PRF expansion) — independent Python re-derivations."""

from __future__ import annotations

import math
from datetime import date

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_lorenz_deciles_match_python_replay(spark, sf_dir):
    cust = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        cust[r.o_custkey] = cust.get(r.o_custkey, 0) + math.floor(
            float(r.o_totalprice) * 100.0 + 0.5
        )
    ranked = sorted(cust.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    total = sum(c for _, c in ranked)
    cum = 0
    cums = []
    for _, c in ranked:
        cum += c
        cums.append(cum)
    got = {
        r.decile: r
        for r in QUERIES["agg_lorenz_deciles"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 11))
    prev_share = -1
    for d in range(1, 11):
        rk = (d * n + 9) // 10
        r = got[d]
        assert (r.n_customers, r.cum_cents) == (rk, cums[rk - 1])
        assert r.share_micro == _trunc_div(
            2000000 * cums[rk - 1] + total, 2 * total
        )
        # Lorenz curve is non-decreasing and convex-bounded by 1
        assert r.share_micro >= prev_share
        prev_share = r.share_micro
    assert got[10].share_micro == 1_000_000


def test_dow_profile_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    dow = {}
    for r in io.load_events(spark, sf_dir).collect():
        d = (r.ts.date() - epoch).days % 7
        dow[d] = dow.get(d, 0) + 1
    total = sum(dow.values())
    terms = {
        d: _trunc_div(
            2000000 * (7 * n - total) * (7 * n - total) + 7 * total,
            14 * total,
        )
        for d, n in dow.items()
    }
    chi2_total = sum(terms.values())
    got = {
        r.dow: r
        for r in QUERIES["ts_dow_profile"](spark, sf_dir).collect()
    }
    assert set(got) == set(dow)
    for d, n in dow.items():
        r = got[d]
        assert r.n == n
        assert r.share_micro == _trunc_div(
            2000000 * n + total, 2 * total
        )
        assert r.chi2_term_micro == terms[d]
        assert r.chi2_total_micro == chi2_total


def test_prf_expansion_matches_python_replay(spark, sf_dir):
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    nd = len(docs)
    tf, df = {}, {}
    for d, toks in docs.items():
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            tf[(d, t)] = c
            df[t] = df.get(t, 0) + 1
    qterms = sorted(df, key=lambda t: (-df[t], t))[:3]
    want = {}
    for q in qterms:
        scored = sorted(
            (
                (-tfv * math.log(nd / df[q]), d)
                for (d, t), tfv in tf.items()
                if t == q
            ),
        )[:5]
        hit_docs = [d for _, d in scored]
        exp = {}
        for d in hit_docs:
            for t in set(docs[d]):
                if t == q:
                    continue
                exp[t] = exp.get(t, 0) + tf[(d, t)]
        ranked = sorted(
            (
                (
                    t,
                    math.floor(
                        1e6 * s * math.log(nd / df[t]) + 0.5
                    ),
                )
                for t, s in exp.items()
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        for i, (t, s) in enumerate(ranked):
            want[(q, t)] = (s, i + 1)
    got = {
        (r.query_term, r.expansion_term): (r.exp_micro, r.term_rank)
        for r in QUERIES["text_prf_expansion"](spark, sf_dir).collect()
    }
    assert got == want
