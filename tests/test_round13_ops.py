"""Semantics tests for the round-13 breadth keys (item-item CF, eager
aggregation pushdown, annealed data-mixture schedule) — independent
Python re-derivations, not oracle re-runs."""

from __future__ import annotations

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_item_cf_matches_python_rederivation(spark, sf_dir):
    """Rebuild the co-purchase counts and exact-integer cos^2 ranking
    per item in Python from the raw lineitem fixture and compare the
    surviving top-3 sets exactly."""
    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item_c = {}
    co = {}
    for parts in baskets.values():
        for p in parts:
            item_c[p] = item_c.get(p, 0) + 1
        for a in parts:
            for b in parts:
                if a != b:
                    co[(a, b)] = co.get((a, b), 0) + 1
    scored = {}
    for (a, b), c in co.items():
        cos2 = c * c * 1000000 // (item_c[a] * item_c[b])
        scored.setdefault(a, []).append((-cos2, -c, b))
    want = set()
    for a, cands in scored.items():
        cands.sort()
        for rnk, (ncos2, nc, b) in enumerate(cands[:3], start=1):
            want.add((a, b, -nc, -ncos2, rnk))
    got = {
        (r.item_a, r.item_b, r.co, r.cos2_micro, r.rnk)
        for r in QUERIES["recs_item_cf"](spark, sf_dir).collect()
    }
    assert got == want


def test_item_cf_pair_join_is_basket_blocked(spark, sf_dir):
    """The self-join must be an equi-join on the basket key (SortMerge
    or ShuffledHash on l_orderkey), never a cartesian pair enumeration."""
    plan = QUERIES["recs_item_cf"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_eager_agg_equals_naive_join_then_aggregate(spark, sf_dir):
    """The whole point of the rewrite: pre-aggregate-then-join must be
    value-identical to the naive join-then-aggregate, replayed in
    Python with the same cents arithmetic."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    ).collect()
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    rev = defaultdict(Decimal)
    nsupp = defaultdict(set)
    for r in li:
        nation = nat[supp[r.l_suppkey]]
        bp = 100 - math.floor(float(r.l_discount) * 100 + 0.5)
        rev[nation] += Decimal(str(r.l_extendedprice)).quantize(
            Decimal("0.01")
        ) * bp
        nsupp[nation].add(r.l_suppkey)
    got = {
        r.nation: (r.revenue_c, r.n_suppliers)
        for r in QUERIES["agg_pushdown_join"](spark, sf_dir).collect()
    }
    assert set(got) == set(rev)
    for nation in rev:
        assert abs(got[nation][0] - float(rev[nation]) / 100.0) < 1e-6
        assert got[nation][1] == len(nsupp[nation])


def test_eager_agg_joins_after_partial_are_broadcast(spark, sf_dir):
    """The dimension joins must run over the per-supplier partials via
    broadcast — no fact-sized shuffle reaches a join operator."""
    plan = QUERIES["agg_pushdown_join"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_anneal_mix_endpoints_and_budget(spark, sf_dir):
    """Step 0 must be the natural (token-proportional) mixture, the
    last step uniform, interior steps on the exact integer line between
    them; per-step tokens are the micro-weight share of the budget."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = {}
    for d in docs:
        toks[d.source] = toks.get(d.source, 0) + len(d.text.split(" "))
    n = sum(toks.values())
    k = len(toks)
    steps = 10
    want = {}
    for src, t in toks.items():
        nat = t * 1000000 // n
        uni = 1000000 // k
        for s in range(steps):
            w = ((steps - 1 - s) * nat + s * uni) // (steps - 1)
            want[(s, src)] = (w, w * 50_000 // 1000000)
    got = {
        (r.step, r.source): (r.weight_micro, r.step_tokens)
        for r in QUERIES["corpus_anneal_mix"](spark, sf_dir).collect()
    }
    assert got == want
    # endpoints: step 0 natural, step 9 uniform
    for src, t in toks.items():
        assert got[(0, src)][0] == t * 1000000 // n
        assert got[(steps - 1, src)][0] == 1000000 // k
