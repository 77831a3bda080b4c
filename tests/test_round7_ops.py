"""Semantics tests for the round-7 breadth keys (winnowing, ACF,
PAA/SAX, embedding-truncation quality, typed-state port) — independent
re-derivations in plain Python, not oracle re-runs (verify_local covers
those)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _winnow_py(text: str, k: int = 8, w: int = 4) -> set[int]:
    s = text[:400]
    n_grams = len(s) - (k - 1)
    if n_grams < w:
        return set()
    hashes = [
        int(hashlib.md5(s[p : p + k].encode()).hexdigest()[:10], 16)
        for p in range(n_grams)
    ]
    return {min(hashes[p : p + w]) for p in range(n_grams - w + 1)}


def test_winnow_matches_reference_python(spark, sf_dir):
    """Per doc, (n_fp, fp_sum) must equal a from-scratch Python winnow."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {
        r.doc_id: (r.n_fp, r.fp_sum)
        for r in QUERIES["text_winnow"](spark, sf_dir).collect()
    }
    want = {}
    for doc_id, text in docs.items():
        fps = _winnow_py(text)
        if fps:
            want[doc_id] = (len(fps), sum(fps))
    assert got == want


def test_winnow_shared_substring_shares_fingerprint():
    """The winnowing guarantee: two texts sharing a substring of length
    >= k + w - 1 = 11 must share at least one fingerprint."""
    shared = "the quick brown fox jumps"
    a = "AAAA " + shared + " zzzz"
    b = "completely different prefix " + shared + " and suffix"
    assert _winnow_py(a) & _winnow_py(b)


def test_acf_constant_series_is_null_and_lag1_reference(spark, sf_dir):
    """den/num are exact integers; a reference Python ACF on one user
    must agree, and lag-1 autocorrelation is within [-1, 1]."""
    rows = QUERIES["ts_acf"](spark, sf_dir).collect()
    assert rows, "no users"
    for r in rows:
        if r.den == 0:
            assert r.acf1 is None and r.acf5 is None
        else:
            if r.acf1 is not None:
                assert -1.0 - 1e-9 <= r.acf1 <= 1.0 + 1e-9
            assert r.acf1 == pytest.approx(r.num1 / r.den)

    # independent re-derivation for the first user
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    uid = rows[0].user_id
    series = sorted(
        ((r.ts, r.event_id, r.value) for r in ev if r.user_id == uid)
    )
    import math

    xc = [math.floor(v * 100.0 + 0.5) for _, _, v in series]
    n, s = len(xc), sum(xc)
    d = [n * x - s for x in xc]
    den = sum(t * t for t in d)
    num1 = sum(d[i] * d[i - 1] for i in range(1, n))
    got = next(r for r in rows if r.user_id == uid)
    assert (got.den, got.num1) == (den, num1)


def test_paa_sax_word_shape_and_range_quartiles(spark, sf_dir):
    """Every SAX word has 8 letters from a..d; the min-sum segment maps
    to 'a' and the max-sum segment to 'd' (unless constant)."""
    rows = QUERIES["ts_paa_sax"](spark, sf_dir).collect()
    assert rows, "no eligible users"
    for r in rows:
        assert len(r.sax) == 8
        assert set(r.sax) <= set("abcd")
        if len(set(r.sax)) > 1:
            assert "a" in r.sax and "d" in r.sax


def test_emb_truncate_quality_agreement_and_self_consistency(spark, sf_dir):
    """agree == (nn_full == nn_trunc); a reasonable fraction of queries
    must keep their exact neighbor under 16-dim truncation; and nn_full
    must equal a brute-force integer-L2 top-1."""
    import math

    rows = QUERIES["emb_truncate_quality"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.agree == (1 if r.nn_full == r.nn_trunc else 0)

    embs = {
        r.vec_id: [math.floor(float(x) * 1000) for x in r.embedding[:64]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    q0 = rows[0].query_id
    best = min(
        (
            (
                sum((a - b) * (a - b) for a, b in zip(embs[q0], v)),
                vid,
            )
            for vid, v in embs.items()
            if vid != q0
        ),
    )
    assert rows[0].nn_full == best[1]


def test_typed_state_fallback_matches_oracle_semantics(spark, sf_dir):
    """Without protobuf the key degrades to the GroupState path; either
    way the answer must equal the batch aggregate."""
    got = {
        r.user_id: (r.n_events, r.total_cents)
        for r in QUERIES["stream_typed_state"](spark, sf_dir).collect()
    }
    from hh_rumors_presto_spark import io

    want = {
        r.user_id: (r.n_events, r.total_cents)
        for r in io.load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value").cast("double") * 100.0 + 0.5).cast(
                    "bigint"
                )
            ).alias("total_cents"),
        )
        .collect()
    }
    assert got == want
