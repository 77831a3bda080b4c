"""Semantics tests for the round-37 keys (Brier/BSS, held-out LM,
nested pruning) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_brier_matches_python_replay(spark, sf_dir):
    pts = [
        (
            math.floor(float(r.value) * 100.0 + 0.5) % 100,
            1 if r.event_type == "purchase" else 0,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None and r.event_type in ("purchase", "view")
    ]
    n = len(pts)
    pos = sum(y for _, y in pts)
    s = sum((c - 100 * y) ** 2 for c, y in pts)
    row = QUERIES["eval_brier_score"](spark, sf_dir).collect()[0]
    assert (row.n, row.n_pos, row.sq_err_sum) == (n, pos, s)
    assert abs(row.brier - s / (10000.0 * n)) < 1e-6
    assert abs(row.bss - (1.0 - s * n / (10000.0 * pos * (n - pos)))) < 1e-5
    # Brier is bounded [0, 1]
    assert 0.0 <= row.brier <= 1.0


def test_heldout_ppl_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    train, held = {}, []
    for r in docs:
        toks = r.text.split(" ")
        if r.doc_id % 2 == 0:
            for t in toks:
                train[t] = train.get(t, 0) + 1
        else:
            held.extend(toks)
    n_train = sum(train.values())
    v = len(train)
    nll = []
    oov = 0
    for t in held:
        c = train.get(t)
        if c is None:
            oov += 1
        p = ((c or 0) + 0.5) / (n_train + 0.5 * (v + 1))
        nll.append(math.floor(1e6 * math.log(p) + 0.5))
    T = len(held)
    row = QUERIES["eval_lm_heldout_ppl"](spark, sf_dir).collect()[0]
    assert (row.n_tokens, row.n_oov) == (T, oov)
    assert row.oov_micro == (2000000 * oov + T) // (2 * T)
    assert row.avg_nll_micro == (-2 * sum(nll) + T) // (2 * T)
    # NLL is positive (probabilities < 1) and above the OOV floor
    assert row.avg_nll_micro > 0


def test_nested_prune_matches_and_prunes(spark, sf_dir):
    counts = {}
    for r in io.load_events(spark, sf_dir).collect():
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    df = QUERIES["scan_nested_prune"](spark, sf_dir)
    got = {r.user_id: r.n_events for r in df.collect()}
    assert got == counts
    # the scan must read ONLY the who.user_id leaf — siblings pruned
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "user_id" in read_schema
    assert "props" not in read_schema
    assert "event_type" not in read_schema
