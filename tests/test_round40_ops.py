"""Semantics tests for the round-40 keys (lag matrix, centroid
classifier, filter ablation) — independent Python re-derivations."""

from __future__ import annotations

import math
import re
from datetime import timedelta

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_lag_matrix_matches_python_replay(spark, sf_dir):
    ev = io.load_events(spark, sf_dir).collect()
    pur, span = {}, {}
    for r in ev:
        d = r.ts.date()
        lo, hi = span.get(r.user_id, (d, d))
        span[r.user_id] = (min(lo, d), max(hi, d))
        if r.event_type == "purchase":
            pur[(r.user_id, d)] = pur.get((r.user_id, d), 0) + 1
    want = {}
    for u, (lo, hi) in span.items():
        days = [lo + timedelta(days=i) for i in range((hi - lo).days + 1)]
        cs = [pur.get((u, d), 0) for d in days]
        last_p = None
        for i, d in enumerate(days):
            lbl = cs[i + 1] if i + 1 < len(cs) else None
            lag1 = cs[i - 1] if i >= 1 else None
            s7 = sum(cs[max(0, i - 6) : i + 1])
            gap = (d - last_p).days if last_p is not None else None
            if lbl is not None and lag1 is not None:
                want[(u, d)] = (lbl, cs[i], lag1, s7, gap)
            if cs[i] > 0:
                last_p = d
    got = {
        (r.user_id, r.day): (
            r.label, r.f_today, r.f_lag1, r.f_7d_sum,
            r.days_since_purchase,
        )
        for r in QUERIES["feat_lag_matrix"](spark, sf_dir).collect()
    }
    assert got == want
    # leakage check: features never look past `day` — implied by the
    # replay equality, but assert the label is genuinely tomorrow's
    # count for a spot sample
    for (u, d), (lbl, *_rest) in list(want.items())[:20]:
        assert lbl == pur.get((u, d + timedelta(days=1)), 0)


def test_centroid_classifier_matches_python_replay(spark, sf_dir):
    embs = [
        (r.vec_id, r.label, [
            math.floor(float(v) * 1e6 + 0.5) for v in r.embedding
        ])
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ]
    dims = len(embs[0][2])
    cent = {}
    for vid, lbl, xs in embs:
        if vid % 2 == 0:
            sums, n = cent.get(lbl, ([0] * dims, 0))
            cent[lbl] = ([a + b for a, b in zip(sums, xs)], n + 1)
    cent = {
        lbl: [(2 * s + n) // (2 * n) for s in sums]
        for lbl, (sums, n) in cent.items()
    }
    per = {}
    for vid, lbl, xs in embs:
        if vid % 2 == 0:
            continue
        best = min(
            cent,
            key=lambda cl: (
                sum((x - c) ** 2 for x, c in zip(xs, cent[cl])),
                cl,
            ),
        )
        n, ok = per.get(lbl, (0, 0))
        per[lbl] = (n + 1, ok + (best == lbl))
    rows = {
        r.label: r
        for r in QUERIES["emb_centroid_classifier"](spark, sf_dir).collect()
    }
    assert set(rows) == set(per)
    for lbl, (n, ok) in per.items():
        r = rows[lbl]
        assert (r.n, r.n_correct) == (n, ok)
        assert r.acc_micro == (2000000 * ok + n) // (2 * n)


def test_filter_ablation_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    agg = {r: [0, 0, 0] for r in ("short", "wordlen", "symbol", "dup", "any")}
    for d in docs:
        toks = d.text.split(" ")
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_sym = sum(len(re.sub(r"[a-zA-Z0-9]", "", t)) for t in toks)
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        max_c = max(counts.values())
        f = {
            "short": n < 10,
            "wordlen": sum_len > 10 * n or sum_len < 2 * n,
            "symbol": 10 * n_sym > 3 * sum_len,
            "dup": 5 * max_c > n,
        }
        total = sum(f.values())
        for rule, hit in f.items():
            if hit:
                agg[rule][0] += 1
                if total == 1:
                    agg[rule][1] += 1
                    agg[rule][2] += n
        if total > 0:
            agg["any"][0] += 1
            agg["any"][1] += 1
            agg["any"][2] += n
    got = {
        r.rule: (r.n_fail, r.n_unique, r.tokens_unique)
        for r in QUERIES["corpus_filter_ablation"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # unique failures can never exceed total failures
    for rule in ("short", "wordlen", "symbol", "dup"):
        assert got[rule][1] <= got[rule][0]
