"""Semantics tests for the late-round-5 keys (bloom prefilter,
clustering coefficient, modularity, epoch expansion, RAKE, span
corruption, FIM) — independent Python re-derivations, not oracle
re-runs."""

from __future__ import annotations

import hashlib
import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _md5i(s: str, nhex: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def test_bloom_membership_guarantee_and_fp_flags(spark, sf_dir):
    """No false negatives (every exact dup must be a bloom hit), and the
    false_pos flag must equal bloom_hit AND NOT exact_dup."""
    rows = QUERIES["dedup_bloom_membership"](spark, sf_dir).collect()
    assert rows, "empty batch"
    for r in rows:
        if r.exact_dup == 1:
            assert r.bloom_hit == 1, f"false negative at doc {r.doc_id}"
        assert r.false_pos == (1 if (r.bloom_hit and not r.exact_dup) else 0)

    # brute-force replay of the bloom for one batch doc
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    corpus_fps = {
        hashlib.md5(t.encode()).hexdigest()
        for d, t in docs.items()
        if d % 3 != 0
    }
    positions = {
        _md5i(f"{fp}#{i}", 8) % 16384 for fp in corpus_fps for i in range(3)
    }
    got = {r.doc_id: r.bloom_hit for r in rows}
    for doc_id, text in docs.items():
        if doc_id % 3 != 0:
            continue
        fp = hashlib.md5(text.encode()).hexdigest()
        want_hit = all(
            _md5i(f"{fp}#{i}", 8) % 16384 in positions for i in range(3)
        )
        assert got[doc_id] == (1 if want_hit else 0), doc_id


def test_clustering_coeff_bounds_and_triangle_consistency(spark, sf_dir):
    """coeff in [0, 1]; n_tri consistent with graph_triangles; degree-1
    nodes report NULL."""
    coeff_rows = QUERIES["graph_clustering_coeff"](spark, sf_dir).collect()
    tri = {
        r.doc_id: r.n_tri
        for r in QUERIES["graph_triangles"](spark, sf_dir).collect()
    }
    assert coeff_rows
    for r in coeff_rows:
        assert tri.get(r.doc_id, 0) == r.n_tri
        if r.degree < 2:
            assert r.coeff is None
        else:
            assert -1e-12 <= r.coeff <= 1 + 1e-12
            assert r.coeff == 2.0 * r.n_tri / (r.degree * (r.degree - 1))


def test_modularity_identity_and_range(spark, sf_dir):
    """Q = q_num/q_den exactly; Q in [-1, 1]."""
    (r,) = QUERIES["graph_modularity"](spark, sf_dir).collect()
    assert r.q_den == 4 * r.m * r.m
    assert r.modularity == r.q_num / r.q_den
    assert -1.0 <= r.modularity <= 1.0


def test_epoch_expand_hits_token_target(spark, sf_dir):
    """Every source's expanded token mass must land within one max-doc of
    the uniform target U = max source mass, and the largest source must
    expand exactly once per doc."""
    rows = QUERIES["corpus_epoch_expand"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok = {}
    maxdoc = {}
    for d in docs:
        n = len(d.text.split(" "))
        tok[d.source] = tok.get(d.source, 0) + n
        maxdoc[d.source] = max(maxdoc.get(d.source, 0), n)
    u = max(tok.values())
    for r in rows:
        t = tok[r.source]
        whole = u // t
        # per-doc Poisson rounding: every doc repeats whole or whole+1
        # times, so the expanded mass is bracketed by one whole epoch
        # (E[mass] = U; the realized draw sits inside the bracket)
        assert r.min_repeats >= whole and r.max_repeats <= whole + 1
        assert whole * t <= r.expanded_tokens <= (whole + 1) * t
        if t == u:
            assert r.n_expanded == r.n_docs
            assert r.min_repeats == r.max_repeats == 1


def test_rake_scores_match_reference_python(spark, sf_dir):
    """Re-derive RAKE for every doc in plain Python and compare the
    top-3 (phrase, score_micro) sets."""
    stop = {
        "the", "of", "and", "a", "to", "in", "is", "on", "for", "with",
        "as", "by", "at", "an", "be", "this", "that", "it", "are", "was",
    }
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    want = {}
    for doc_id, text in docs.items():
        toks = text.split(" ")
        phrases = []
        cur = []
        for t in toks:
            if t == "" or t.lower() in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t.lower())
        if cur:
            phrases.append(cur)
        if not phrases:
            continue
        freq: dict[str, int] = {}
        deg: dict[str, int] = {}
        for ph in phrases:
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
        scored = []
        for ph in phrases:
            score = sum(deg[w] * 1_000_000 // freq[w] for w in set(ph))
            scored.append((" ".join(ph), score))
        # distinct phrases can repeat; the query scores per (doc, phrase_id)
        scored.sort(key=lambda x: (-x[1], x[0]))
        want[doc_id] = scored[:3]
    got: dict[int, list] = {}
    for r in QUERIES["text_rake_keywords"](spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append((r.phrase, r.score_micro))
    for doc_id in got:
        got[doc_id].sort(key=lambda x: (-x[1], x[0]))
        assert got[doc_id] == want[doc_id], doc_id


def test_span_corrupt_roundtrip_reconstructs_document(spark, sf_dir):
    """Splicing each sentinel's span from target_text back into
    input_text must reproduce the original document exactly."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if len(r.text.split(" ")) >= 10
    }
    rows = QUERIES["pipeline_span_corrupt"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    checked_with_corruption = 0
    for r in rows:
        spans = {}
        if r.target_text:
            parts = r.target_text.split("<X_")
            for p in parts[1:]:
                k, rest = p.split(">", 1)
                spans[f"<X_{k}>"] = rest.strip(" ")
            checked_with_corruption += 1
        rebuilt = " ".join(
            spans.get(tok, tok) for tok in r.input_text.split(" ")
        )
        assert rebuilt == docs[r.doc_id], r.doc_id
        n_masked = sum(
            len(v.split(" ")) for v in spans.values()
        )
        assert n_masked == r.n_corrupted_tokens
    assert checked_with_corruption > 0, "no doc had any corrupted span"


def test_fim_reassembly_and_middle_count(spark, sf_dir):
    """PRE + MID + SUF concatenated in document order must equal the
    original token stream; middle length must match the thirds split."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if len(r.text.split(" ")) >= 6
    }
    rows = QUERIES["pipeline_fim_format"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    for r in rows:
        toks = docs[r.doc_id]
        n = len(toks)
        body = r.fim_text
        assert body.startswith("<PRE> ")
        pre, rest = body[len("<PRE> "):].split(" <SUF> ", 1)
        suf, mid = rest.split(" <MID> ", 1)
        assert (pre + " " + mid + " " + suf).split(" ") == toks
        assert r.n_middle_tokens == 2 * n // 3 - n // 3 == len(mid.split(" "))
