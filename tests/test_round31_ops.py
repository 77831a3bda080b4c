"""Semantics tests for the round-31 ranking-metric keys (AUC, NDCG,
MRR) — independent Python re-derivations, not oracle re-runs."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _scored(spark, sf_dir):
    return [
        (
            r.user_id,
            r.event_id,
            r.event_type,
            math.floor(float(r.value) * 100.0 + 0.5),
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None
    ]


def test_auc_matches_sklearn_style_replay(spark, sf_dir):
    """Replay AUC as the mean over all (pos, neg) pairs of
    [s_pos > s_neg] + 0.5*[tie] — the definition, not the rank-sum
    shortcut the query uses."""
    pts = [
        (c, 1 if et == "purchase" else 0)
        for _, _, et, c in _scored(spark, sf_dir)
        if et in ("purchase", "view")
    ]
    pos = sorted(c for c, y in pts if y == 1)
    neg = sorted(c for c, y in pts if y == 0)
    import bisect

    num2 = 0  # doubled pair score to stay integer
    for p in pos:
        lt = bisect.bisect_left(neg, p)
        eq = bisect.bisect_right(neg, p) - lt
        num2 += 2 * lt + eq
    row = QUERIES["eval_auc_roc"](spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert row.u2 == num2
    assert abs(row.auc - num2 / (2 * len(pos) * len(neg))) < 1e-6
    assert 0.0 <= row.auc <= 1.0


def _topk(rows):
    by_user = {}
    for u, eid, et, c in rows:
        by_user.setdefault(u, []).append((-c, eid, et))
    out = {}
    for u, lst in by_user.items():
        lst.sort()
        out[u] = [(et == "purchase") for _, _, et in lst[:10]]
    return by_user, out


def test_ndcg_matches_python_replay(spark, sf_dir):
    rows = _scored(spark, sf_dir)
    by_user, topk = _topk(rows)
    w = [
        math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, 11)
    ]
    cw = [sum(w[: i + 1]) for i in range(10)]
    nds = []
    for u, lst in by_user.items():
        r_total = sum(1 for _, _, et in lst if et == "purchase")
        if r_total < 1:
            continue
        dcg = sum(w[i] for i, rel in enumerate(topk[u]) if rel)
        idcg = cw[min(10, r_total) - 1]
        nds.append((2000000 * dcg + idcg) // (2 * idcg))
    row = QUERIES["eval_ndcg"](spark, sf_dir).collect()[0]
    assert row.n_users == len(nds)
    assert abs(row.mean_ndcg_at_10 - sum(nds) / (1e6 * len(nds))) < 1e-5
    assert row.n_perfect == sum(1 for n in nds if n == 1000000)


def test_mrr_matches_python_replay(spark, sf_dir):
    rows = _scored(spark, sf_dir)
    by_user, topk = _topk(rows)
    rrs, hit1, hit10 = [], 0, 0
    for u in by_user:
        first = next(
            (i + 1 for i, rel in enumerate(topk[u]) if rel), None
        )
        if first is None:
            rrs.append(0)
        else:
            rrs.append((2000000 + first) // (2 * first))
            hit1 += first == 1
            hit10 += 1
    row = QUERIES["eval_mrr"](spark, sf_dir).collect()[0]
    assert row.n_users == len(rrs)
    assert abs(row.mrr_at_10 - sum(rrs) / (1e6 * len(rrs))) < 1e-5
    assert (row.n_hit_at_1, row.n_hit_at_10) == (hit1, hit10)
    # MRR is bounded by hit@10 rate and above hit@1 rate
    assert row.n_hit_at_1 / row.n_users - 1e-9 <= row.mrr_at_10
    assert row.mrr_at_10 <= row.n_hit_at_10 / row.n_users + 1e-9
