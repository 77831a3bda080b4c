"""Semantics tests for the round-14 breadth keys (multinomial Naive
Bayes, mutual information, Theil–Sen) — independent Python
re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _mnat(x: float) -> int:
    return math.floor(math.log(x) * 1000000.0 + 0.5)


def test_naive_bayes_matches_python_rederivation(spark, sf_dir):
    """Replay the add-one-smoothed NB scores (micro-nat integer terms)
    per doc/class in Python and compare the argmax rows exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = {d.doc_id: d.text.split(" ") for d in docs if d.text is not None}
    lang = {d.doc_id: d.lang for d in docs}
    n_docs = {}
    cnt = {}
    ctot = {}
    vocab = set()
    for did, ts in toks.items():
        vocab.update(ts)
        c = lang[did]
        if c is None:
            continue
        n_docs[c] = n_docs.get(c, 0) + 1
        for t in ts:
            cnt[(c, t)] = cnt.get((c, t), 0) + 1
            ctot[c] = ctot.get(c, 0) + 1
    tot_docs = sum(n_docs.values())
    v = len(vocab)
    want = {}
    for did, ts in toks.items():
        if not ts:
            continue
        best = None
        for c in sorted(n_docs):
            s = _mnat(n_docs[c] / tot_docs)
            for t in ts:
                s += _mnat((cnt.get((c, t), 0) + 1) / (ctot[c] + v))
            if best is None or s > best[1]:
                best = (c, s)
        want[did] = (best[0], best[1], best[0] == lang[did])
    got = {
        r.doc_id: (r.pred_lang, r.score_mnat, r.correct)
        for r in QUERIES["ml_naive_bayes"](spark, sf_dir).collect()
    }
    assert got == want


def test_naive_bayes_output_structure(spark, sf_dir):
    """One argmax row per non-empty doc, predictions drawn from the
    trained class set, and accuracy at least the majority-class rate
    (the synthetic fixture has ~zero language signal — documented for
    text_langid_accuracy — so NB can only match the prior, not soar)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    langs = [d.lang for d in docs if d.lang is not None]
    majority = max(langs.count(c) for c in set(langs)) / len(docs)
    rows = QUERIES["ml_naive_bayes"](spark, sf_dir).collect()
    assert len(rows) == sum(1 for d in docs if d.text is not None)
    assert {r.pred_lang for r in rows} <= set(langs)
    acc = sum(1 for r in rows if r.correct) / len(rows)
    assert acc >= majority - 0.05


def test_mutual_info_matches_python_rederivation(spark, sf_dir):
    """Rebuild the contingency table in Python, recompute per-cell PMI
    micro-nats and the N-weighted total, compare exactly."""
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    cells = {}
    for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        k = (cust[o.o_custkey], o.o_orderpriority)
        cells[k] = cells.get(k, 0) + 1
    n = sum(cells.values())
    nx = {}
    ny = {}
    for (x, y), c in cells.items():
        nx[x] = nx.get(x, 0) + c
        ny[y] = ny.get(y, 0) + c
    pmi = {
        k: _mnat(c * n / (nx[k[0]] * ny[k[1]]))
        for k, c in cells.items()
    }
    total = sum(cells[k] * pmi[k] for k in cells)
    got = {
        (r.x, r.y): (r.n_xy, r.pmi_mnat, r.contrib_mnat, r.mi_total_mnat)
        for r in QUERIES["agg_mutual_info"](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for k in cells:
        assert got[k] == (cells[k], pmi[k], cells[k] * pmi[k], total)
    # MI of a product distribution is ~0; fixture columns are independent
    # by construction, so |MI| must be small but the cells nonzero
    assert abs(total / n / 1e6) < 0.05


def test_theil_sen_matches_python_rederivation(spark, sf_dir):
    """Replay the daily-cents series, all pairwise slopes, and the
    lower-median selection in Python; compare per event_type."""
    daily = {}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.value is None:
            continue
        day = r.ts.date() if hasattr(r.ts, "date") else r.ts
        k = (r.event_type, day)
        daily[k] = daily.get(k, 0) + math.floor(float(r.value) * 100.0 + 0.5)
    series = {}
    for (et, day), cents in daily.items():
        series.setdefault(et, []).append((day, cents))
    want = {}
    for et, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d1, c1 = pts[i]
                d2, c2 = pts[j]
                slopes.append(((c2 - c1) / (d2 - d1).days, d1, d2))
        if not slopes:
            continue
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        want[et] = (len(pts), len(slopes), round(med, 6))
    got = {
        r.event_type: (r.n_days, r.n_pairs, r.sen_slope)
        for r in QUERIES["ts_theil_sen"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for et in want:
        assert got[et][0] == want[et][0]
        assert got[et][1] == want[et][1]
        assert abs(got[et][2] - want[et][2]) < 1e-9


def test_theil_sen_robust_to_outlier_day(spark):
    """The defining property: corrupting ONE day by 1000x must leave
    the Theil–Sen slope (of the uncorrupted pair majority) unchanged,
    while the OLS slope on the same series moves. Checked in pure
    Python against the same lower-median definition the key uses."""
    pts = [(d, 100 + 10 * d) for d in range(10)]  # slope exactly 10
    corrupted = [(d, c if d != 5 else c + 100000) for d, c in pts]

    def sen(series):
        slopes = sorted(
            (series[j][1] - series[i][1]) / (series[j][0] - series[i][0])
            for i in range(len(series))
            for j in range(i + 1, len(series))
        )
        return slopes[(len(slopes) + 1) // 2 - 1]

    assert sen(pts) == 10.0
    assert sen(corrupted) == 10.0  # median of pairs ignores the spike
