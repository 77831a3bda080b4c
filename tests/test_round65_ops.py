"""Semantics tests for the round-65 keys (Distinct-n, self-BLEU
lite, dedup dashboard) — independent Python re-derivations."""

from __future__ import annotations

import hashlib

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def _docs(spark, sf_dir):
    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]


def test_distinct_n_matches_python_replay(spark, sf_dir):
    totals = {1: 0, 2: 0, 3: 0}
    uniq = {1: set(), 2: set(), 3: set()}
    for _, text in _docs(spark, sf_dir):
        toks = text.split(" ")
        for n in (1, 2, 3):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                totals[n] += 1
                uniq[n].add(g)
    got = {
        r.n: (r.total_ngrams, r.unique_ngrams, r.distinct_micro)
        for r in QUERIES["eval_distinct_n"](spark, sf_dir).collect()
    }
    for n in (1, 2, 3):
        t, u = totals[n], len(uniq[n])
        assert got[n] == (t, u, _trunc_div(2000000 * u + t, 2 * t))
    # diversity can only grow with n (longer grams repeat less)
    assert (
        got[1][2] <= got[2][2] <= got[3][2]
    )


def test_self_bleu_lite_matches_python_replay(spark, sf_dir):
    per_doc = {}
    gdocs = {}
    for doc_id, text in _docs(spark, sf_dir):
        toks = text.split(" ")
        grams = {
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        }
        if grams:
            per_doc[doc_id] = grams
            for g in grams:
                gdocs[g] = gdocs.get(g, 0) + 1
    total = sum(len(g) for g in per_doc.values())
    shared = sum(
        sum(1 for g in grams if gdocs[g] > 1)
        for grams in per_doc.values()
    )
    row = QUERIES["eval_self_bleu_lite"](spark, sf_dir).collect()[0]
    assert (row.n_docs, row.total_distinct_bigrams) == (
        len(per_doc), total,
    )
    assert row.shared_bigrams == shared
    assert row.self_overlap_micro == _trunc_div(
        2000000 * shared + total, 2 * total
    )


def test_dedup_dashboard_matches_python_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    doc_total = len(docs)
    doc_dups = doc_total - len(
        {hashlib.md5(t.encode()).hexdigest() for _, t in docs}
    )
    sent_total = 0
    sent_set = set()
    gram_total = 0
    gram_set = set()
    for _, text in docs:
        for p in text.split(". "):
            p = p.strip()
            if p:
                sent_total += 1
                sent_set.add(hashlib.md5(p.encode()).hexdigest())
        toks = text.split(" ")
        for i in range(len(toks) - 4):
            g = " ".join(toks[i : i + 5])
            gram_total += 1
            gram_set.add(hashlib.md5(g.encode()).hexdigest())
    want = {
        "document": (doc_total, doc_dups),
        "sentence": (sent_total, sent_total - len(sent_set)),
        "5gram": (gram_total, gram_total - len(gram_set)),
    }
    got = {
        r.grain: (r.total, r.duplicates, r.dup_micro)
        for r in QUERIES["corpus_dedup_rate_dashboard"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(want)
    for grain, (t, d) in want.items():
        assert got[grain][:2] == (t, d)
        assert got[grain][2] == _trunc_div(2000000 * d + t, 2 * t)
