"""Semantics tests for the round-56 keys (template mining,
anisotropy, hazard curve) — independent Python re-derivations."""

from __future__ import annotations

import math
import re

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_template_mining_matches_python_replay(spark, sf_dir):
    counts = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        t = re.sub(r"[0-9]+", "#", r.text)
        counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {
        i + 1: (t[:80], n, _trunc_div(2000000 * n + total, 2 * total))
        for i, (t, n) in enumerate(head)
    }
    got = {
        r.rnk: (r.template_head, r.n, r.share_micro)
        for r in QUERIES["text_template_mining"](spark, sf_dir).collect()
    }
    assert got == want


def test_anisotropy_matches_python_replay(spark, sf_dir):
    dims = None
    n = 0
    sums = None
    for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect():
        vals = [float(v) for v in r.embedding]
        nrm = math.sqrt(sum(v * v for v in vals))
        if nrm == 0:
            continue
        u = [math.floor(1e6 * v / nrm + 0.5) for v in vals]
        if sums is None:
            sums = [0] * len(u)
        sums = [a + b for a, b in zip(sums, u)]
        n += 1
    sum_sq = sum(s * s for s in sums)
    aniso = (sum_sq / 1e12 - n) / (n * (n - 1))
    row = QUERIES["emb_anisotropy"](spark, sf_dir).collect()[0]
    assert (row.n_vectors, row.sum_sq) == (n, sum_sq)
    assert abs(row.anisotropy - aniso) < 1e-5
    # mean pairwise cosine is bounded
    assert -1.0 <= row.anisotropy <= 1.0


def test_hazard_curve_matches_python_replay(spark, sf_dir):
    ev = io.load_events(spark, sf_dir).collect()
    d0 = min(r.ts.date() for r in ev)
    last = {}
    for r in ev:
        wk = (r.ts.date() - d0).days // 7
        last[r.user_id] = max(last.get(r.user_id, 0), wk)
    churn = {}
    for wk in last.values():
        churn[wk] = churn.get(wk, 0) + 1
    weeks = sorted(churn, reverse=True)
    at_risk = 0
    want = {}
    for wk in weeks:
        at_risk += churn[wk]
        want[wk] = (
            churn[wk],
            at_risk,
            _trunc_div(2000000 * churn[wk] + at_risk, 2 * at_risk),
        )
    got = {
        r.tenure_week: (r.churned, r.at_risk, r.hazard_micro)
        for r in QUERIES["agg_hazard_curve"](spark, sf_dir).collect()
    }
    assert got == want
    # the final week's hazard is 1 by construction (everyone left
    # at-risk churns at the last observed week)
    last_wk = max(got)
    assert got[last_wk][2] == 1_000_000
