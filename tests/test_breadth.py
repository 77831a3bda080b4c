"""Semantic property tests for the breadth batches (rounds 3-4):
cross-checks against brute-force recomputation on the small fixture, plus
invariants the oracle comparison can't express (idempotency, permutation,
bin-join == theta-join equivalence)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.queries import load

load()
from hh_rumors_presto_spark.registry import QUERIES  # noqa: E402


def test_global_row_number_is_a_permutation_in_key_order(spark, sf_dir):
    rows = QUERIES["global_row_number"](spark, sf_dir).collect()
    by_key = sorted(rows, key=lambda r: r.o_orderkey)
    assert [r.rn for r in by_key] == list(range(1, len(rows) + 1))


def test_join_interval_bin_equals_theta_join(spark, sf_dir):
    """The binned candidate join must produce exactly the pairs the naive
    theta join defines."""
    got = {
        (r.user_id, r.purchase_id, r.error_id)
        for r in QUERIES["join_interval_bin"](spark, sf_dir).collect()
    }
    ev = io.load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    purchases, errors = defaultdict(list), defaultdict(list)
    for r in ev.collect():
        if r.event_type == "purchase":
            purchases[r.user_id].append((r.event_id, r.us))
        elif r.event_type == "error":
            errors[r.user_id].append((r.event_id, r.us))
    expect = {
        (u, pid, eid)
        for u, ps in purchases.items()
        for pid, pus in ps
        for eid, eus in errors.get(u, [])
        if pus - 600_000_000 <= eus <= pus
    }
    assert got == expect


def test_win_pattern_match_against_bruteforce(spark, sf_dir):
    got = {
        (r.user_id, r.start_event_id)
        for r in QUERIES["win_pattern_match"](spark, sf_dir).collect()
    }
    ev = io.load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    per_user = defaultdict(list)
    for r in ev.collect():
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    expect = set()
    for u, evs in per_user.items():
        evs.sort()
        for i in range(len(evs) - 2):
            if [evs[i][2], evs[i + 1][2], evs[i + 2][2]] == [
                "view",
                "click",
                "purchase",
            ]:
                expect.add((u, evs[i][1]))
    assert got == expect


def test_dedup_url_canonical_form_and_conservation(spark, sf_dir):
    rows = QUERIES["dedup_url"](spark, sf_dir).collect()
    n_docs = io.load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_variants for r in rows) == n_docs  # every doc lands once
    for r in rows:
        u = r.canonical_url
        assert u == u.lower()
        assert "#" not in u and "utm_" not in u and not u.endswith("/")


def test_text_pii_mask_finds_exactly_the_injected_pii(spark, sf_dir):
    rows = QUERIES["text_pii_mask"](spark, sf_dir).collect()
    assert rows, "filter selected no docs"
    for r in rows:
        # fixture text is PII-free word salad; exactly one email and one
        # phone are injected per doc
        assert r.n_emails == 1, r
        assert r.n_phones == 1, r


def test_table_checksum_matches_row_counts(spark, sf_dir):
    rows = {r.tbl: r for r in QUERIES["table_checksum"](spark, sf_dir).collect()}
    assert rows["orders"].n == io.load_table(spark, sf_dir, "orders").count()
    assert rows["lineitem"].n == io.load_table(spark, sf_dir, "lineitem").count()
    assert rows["orders"].checksum != rows["lineitem"].checksum


def test_udf_arrow_batch_matches_builtin_column_math(spark, sf_dir):
    """The Arrow kernel must agree bit-for-bit with the JVM expression."""
    got = {
        r.event_id: r.score for r in QUERIES["udf_arrow_batch"](spark, sf_dir).collect()
    }
    ref = {
        r.event_id: r.score
        for r in io.load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "event_id",
            F.round(F.sqrt(F.abs(F.col("value"))) * 3.0, 6).alias("score"),
        )
        .collect()
    }
    assert got == ref


def test_emb_mean_pool_bounds_and_counts(spark, sf_dir):
    emb = io.load_table(spark, sf_dir, "embeddings")
    n_rows = emb.count()
    dims = len(emb.select("embedding").first()[0])
    rows = QUERIES["emb_mean_pool"](spark, sf_dir).collect()
    assert sum(r.n for r in rows) == n_rows * dims
    stats = emb.select(
        F.min(F.array_min("embedding")).alias("lo"),
        F.max(F.array_max("embedding")).alias("hi"),
    ).first()
    for r in rows:
        assert stats.lo - 1e-6 <= r.mean_val <= stats.hi + 1e-6


def test_sample_weighted_matches_bruteforce_es_keys(spark, sf_dir):
    """The k selected docs must be exactly the k smallest -ln(u)/w keys
    recomputed brute-force in Python from the same md5-derived u."""
    import hashlib
    import math

    got = QUERIES["sample_weighted"](spark, sf_dir).collect()
    docs = io.load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    keys = {}
    for r in docs:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        u = (h % 1_000_000_007 + 1) / 1_000_000_009.0
        keys[r.doc_id] = -math.log(u) / math.log(1 + r.n_chars)
    expect = sorted(keys, key=lambda d: (keys[d], d))[: len(got)]
    assert [r.doc_id for r in got] == expect
    for r in got:
        assert abs(r.es_key - keys[r.doc_id]) < 5e-7


def test_layout_range_cluster_spans_are_disjoint_and_complete(spark, sf_dir):
    """Range buckets must partition the table: counts sum to the row count
    and [lo, hi] spans never overlap — the property min-max skipping needs."""
    rows = sorted(
        QUERIES["layout_range_cluster"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    n_orders = io.load_table(spark, sf_dir, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_pipeline_sft_format_token_spans(spark, sf_dir):
    """prompt_tok + response_tok must equal the document token count, and
    the rendered template must reassemble to the original text."""
    out = {r.doc_id: r for r in QUERIES["pipeline_sft_format"](spark, sf_dir).collect()}
    docs = io.load_table(spark, sf_dir, "documents").collect()
    for d in docs:
        toks = d.text.split(" ")
        if len(toks) < 24:
            assert d.doc_id not in out
            continue
        r = out[d.doc_id]
        assert r.prompt_tok == 12 and r.response_tok == len(toks) - 12
        body = r.formatted
        assert body.startswith("<|user|>\n")
        prompt, _, response = body[len("<|user|>\n"):].partition("\n<|assistant|>\n")
        assert (prompt + " " + response) == d.text


def test_win_ntile_bucket_sizes_balanced(spark, sf_dir):
    """Within each priority, NTILE bucket sizes differ by at most 1 and
    bucket value ranges are non-overlapping in bucket order."""
    rows = QUERIES["win_ntile"](spark, sf_dir).collect()
    by_prio = defaultdict(list)
    for r in rows:
        by_prio[r.o_orderpriority].append(r)
    for prio, bs in by_prio.items():
        bs.sort(key=lambda r: r.q)
        sizes = [r.n for r in bs]
        assert max(sizes) - min(sizes) <= 1, (prio, sizes)
        for a, b in zip(bs, bs[1:]):
            assert a.hi <= b.lo


def test_sketch_countmin_row_mass_and_point_estimates(spark, sf_dir):
    """Each of the d sketch rows holds the full event mass, and the CMS
    point estimate (min over rows) upper-bounds every true user count."""
    import hashlib

    rows = QUERIES["sketch_countmin"](spark, sf_dir).collect()
    ev = io.load_table(spark, sf_dir, "events").select("user_id").collect()
    total = len(ev)
    mass = defaultdict(int)
    matrix = {}
    for r in rows:
        mass[r.d] += r.n
        matrix[(r.d, r.bucket)] = r.n
    assert set(mass) == {0, 1, 2, 3}
    assert all(m == total for m in mass.values())
    true = defaultdict(int)
    for r in ev:
        true[r.user_id] += 1
    for uid, cnt in list(true.items())[:50]:
        est = min(
            matrix.get(
                (d, int(hashlib.md5(f"{d}|{uid}".encode()).hexdigest()[:15], 16) % 64),
                0,
            )
            for d in range(4)
        )
        assert est >= cnt


def test_win_running_distinct_final_equals_true_distinct(spark, sf_dir):
    """The max running value per user equals that user's true distinct
    event_type count, and running values never decrease along event order."""
    rows = QUERIES["win_running_distinct"](spark, sf_dir).collect()
    ev = io.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    true = defaultdict(set)
    for r in ev:
        true[r.user_id].add(r.event_type)
    got_max = defaultdict(int)
    for r in rows:
        got_max[r.user_id] = max(got_max[r.user_id], r.distinct_types_so_far)
    assert got_max == {u: len(s) for u, s in true.items()}


def test_try_fns_null_semantics(spark, sf_dir):
    """Zero divisor, unparseable cast, and out-of-bounds index must be
    NULL; valid divisions must equal plain division."""
    rows = QUERIES["try_fns"](spark, sf_dir).collect()
    ev = {r.event_id: r for r in io.load_table(spark, sf_dir, "events").collect()}
    for r in rows:
        e = ev[r.event_id]
        if e.user_id % 5 == 0:
            assert r.safe_ratio is None
        else:
            assert abs(r.safe_ratio - e.value / (e.user_id % 5)) < 1e-9
        assert r.bad_int is None  # event_type never parses as int
        parts = e.event_type.split("_")
        assert r.third_part == (parts[2] if len(parts) >= 3 else None)


def test_win_rolling_median_bruteforce(spark, sf_dir):
    """Trailing-10 median matches a brute-force recomputation for a few
    users (exact interpolated median over the ordered trailing window)."""
    import statistics

    got = QUERIES["win_rolling_median"](spark, sf_dir).collect()
    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    ).collect()
    users = sorted({r.user_id for r in ev})[:5]
    series = {u: [] for u in users}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        if r.user_id in series:
            series[r.user_id].append((r.event_id, r.value))
    expect = {}
    for u, seq in series.items():
        for i, (eid, _) in enumerate(seq):
            window = [v for _, v in seq[max(0, i - 9): i + 1]]
            expect[eid] = round(statistics.median(window), 6)
    checked = 0
    for r in got:
        if r.event_id in expect:
            assert abs(r.med10 - expect[r.event_id]) < 1e-6, r.event_id
            checked += 1
    assert checked == sum(len(s) for s in series.values())


def test_dq_drift_psi_probabilities_sum_to_one(spark, sf_dir):
    """Smoothed per-period probabilities sum to ~1 (up to the missing-bin
    smoothing mass) and PSI contributions are consistent with pa/pb."""
    import math

    rows = QUERIES["dq_drift_psi"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert r.pa > 0 and r.pb > 0
        assert abs(r.psi_contrib - (r.pa - r.pb) * math.log(r.pa / r.pb)) < 2e-5
    # smoothing adds 1/(n+10) per *possible* bin; observed bins' mass is
    # within 10 * 1/(na+10) of 1
    assert abs(sum(r.pa for r in rows) - 1) < 0.01
    assert abs(sum(r.pb for r in rows) - 1) < 0.01


def test_dq_impute_fills_only_error_rows_with_user_mean(spark, sf_dir):
    rows = {r.event_id: r for r in QUERIES["dq_impute"](spark, sf_dir).collect()}
    ev = io.load_table(spark, sf_dir, "events").collect()
    observed = defaultdict(list)
    for e in ev:
        if e.event_type != "error":
            observed[e.user_id].append(e.value)
    g_mean = sum(v for vs in observed.values() for v in vs) / sum(
        len(vs) for vs in observed.values()
    )
    for e in ev:
        r = rows[e.event_id]
        if e.event_type == "error":
            assert r.was_imputed
            exp = (
                sum(observed[e.user_id]) / len(observed[e.user_id])
                if observed.get(e.user_id)
                else g_mean
            )
            assert abs(r.value_imputed - exp) < 1e-6
        else:
            assert not r.was_imputed
            assert abs(r.value_imputed - e.value) < 1e-6


def test_layout_zorder_cells_partition_and_tighten(spark, sf_dir):
    """Z-cells partition the table, and the z-layout tightens per-file
    spans on BOTH dimensions vs a single global file (mean cell span is
    strictly smaller than the full range on each dimension)."""
    rows = QUERIES["layout_zorder"](spark, sf_dir).collect()
    orders = io.load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    assert sum(r.n for r in rows) == n_orders
    p_span = max(r.price_hi for r in rows) - min(r.price_lo for r in rows)
    d_span = max(r.date_hi_us for r in rows) - min(r.date_lo_us for r in rows)
    mean_p = sum(r.price_hi - r.price_lo for r in rows) / len(rows)
    mean_d = sum(r.date_hi_us - r.date_lo_us for r in rows) / len(rows)
    assert mean_p < 0.8 * p_span
    assert mean_d < 0.8 * d_span


def test_emb_knn_graph_bruteforce(spark, sf_dir):
    """k-NN edges match brute-force blocked cosine top-3 per vector."""
    import math

    got = defaultdict(list)
    for r in QUERIES["emb_knn_graph"](spark, sf_dir).collect():
        got[r.vec_a].append(r.vec_b)
    emb = io.load_table(spark, sf_dir, "embeddings").collect()
    by_label = defaultdict(list)
    for r in emb:
        by_label[r.label].append((r.vec_id, [float(x) for x in r.embedding]))
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na * nb else None
    checked = 0
    for label, vs in by_label.items():
        for vid, v in vs:
            scores = sorted(
                ((-(cos(v, u) or -9), uid) for uid, u in vs if uid != vid)
            )[:3]
            assert got.get(vid, []) == [uid for _, uid in scores], vid
            checked += 1
    assert checked == len(emb)


def test_win_anomaly_zscore_bruteforce(spark, sf_dir):
    """z-scores match brute-force rolling mean/std for a few users, and
    anomalies are exactly the |z|>3 rows."""
    import statistics

    rows = {r.event_id: r for r in QUERIES["win_anomaly_zscore"](spark, sf_dir).collect()}
    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    ).collect()
    users = sorted({r.user_id for r in ev})[:4]
    series = {u: [] for u in users}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        if r.user_id in series:
            series[r.user_id].append((r.event_id, r.value))
    checked = 0
    for u, seq in series.items():
        for i, (eid, v) in enumerate(seq):
            window = [x for _, x in seq[max(0, i - 19): i + 1]]
            r = rows[eid]
            if len(window) >= 5 and len(set(window)) > 1:
                mu = sum(window) / len(window)
                sd = statistics.stdev(window)
                z = (v - mu) / sd
                assert abs(r.z - z) < 1e-3, (eid, r.z, z)
                assert r.is_anomaly == (abs(z) > 3.0)
            else:
                assert r.z is None and not r.is_anomaly
            checked += 1
    assert checked == sum(len(s) for s in series.values())


def test_agg_regression_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = {r.event_type: r for r in QUERIES["agg_regression"](spark, sf_dir).collect()}
    ev = io.load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    ).collect()
    groups = defaultdict(lambda: ([], []))
    for e in ev:
        xs, ys = groups[e.event_type]
        xs.append(e.user_id % 100); ys.append(e.value)
    for et, (xs, ys) in groups.items():
        slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        r = rows[et]
        assert abs(r.slope - slope) < 1e-4, et
        assert abs(r.intercept - intercept) < 1e-3, et
        assert r.n == len(xs)


def test_text_entropy_bounds_and_bruteforce(spark, sf_dir):
    """Entropy in [0, ln(n_distinct)] and matches a brute-force
    recomputation for the first 20 docs."""
    import math

    rows = {r.doc_id: r for r in QUERIES["text_entropy"](spark, sf_dir).collect()}
    docs = io.load_table(spark, sf_dir, "documents").collect()
    for d in docs[:20]:
        toks = d.text.split(" ")
        counts = defaultdict(int)
        for t in toks:
            counts[t] += 1
        h = -sum((c / len(toks)) * math.log(c / len(toks)) for c in counts.values())
        r = rows[d.doc_id]
        assert r.n_distinct == len(counts)
        assert abs(r.token_entropy - h) < 1e-5
        assert -1e-9 <= r.token_entropy <= math.log(max(2, len(counts))) + 1e-9


def test_text_lm_score_bruteforce(spark, sf_dir):
    import math

    rows = {r.doc_id: r for r in QUERIES["text_lm_score"](spark, sf_dir).collect()}
    docs = io.load_table(spark, sf_dir, "documents").collect()
    vocab = defaultdict(int)
    for d in docs:
        for t in d.text.split(" "):
            vocab[t] += 1
    n = sum(vocab.values())
    for d in docs[:20]:
        toks = d.text.split(" ")
        avg = sum(math.log(vocab[t] / n + 1e-6) for t in toks) / len(toks)
        r = rows[d.doc_id]
        assert r.n_tokens == len(toks)
        assert abs(r.avg_logp - avg) < 1e-5


def test_agg_weighted_median_bruteforce(spark, sf_dir):
    import json

    rows = {r.event_type: r for r in QUERIES["agg_weighted_median"](spark, sf_dir).collect()}
    ev = io.load_table(spark, sf_dir, "events").collect()
    groups = defaultdict(list)
    for e in ev:
        groups[e.event_type].append((e.value, e.event_id, json.loads(e.props)["k"]))
    for et, items in groups.items():
        items.sort()
        total = sum(w for _, _, w in items)
        cum = 0
        for v, _, w in items:
            cum += w
            if cum >= total / 2:
                break
        r = rows[et]
        assert r.total_weight == total
        assert abs(r.weighted_median - v) < 1e-12, et


def test_dedup_substring_bruteforce(spark, sf_dir):
    """Per-doc duplicated-window counts match brute-force sliding-window
    first-wins over the collected corpus."""
    rows = {r.doc_id: r for r in QUERIES["dedup_substring"](spark, sf_dir).collect()}
    docs = io.load_table(spark, sf_dir, "documents").collect()
    wins = []  # (doc_id, win_idx, text)
    for d in sorted(docs, key=lambda d: d.doc_id):
        toks = d.text.split(" ")
        if len(toks) < 16:
            assert d.doc_id not in rows
            continue
        for wi, start in enumerate(range(0, len(toks) - 16 + 1, 4)):
            wins.append((d.doc_id, wi, " ".join(toks[start:start + 16])))
    seen = set()
    expect = defaultdict(lambda: [0, 0])
    for doc_id, wi, w in sorted(wins):
        expect[doc_id][0] += 1
        if w in seen:
            expect[doc_id][1] += 1
        else:
            seen.add(w)
    for doc_id, (n, dup) in expect.items():
        r = rows[doc_id]
        assert (r.n_windows, r.n_dup_windows) == (n, dup), doc_id


def test_corpus_token_budget_bruteforce(spark, sf_dir):
    """Selected set equals the greedy quality-ordered prefix under the
    budget, with correct cumulative sums."""
    rows = {r.doc_id: r for r in QUERIES["corpus_token_budget"](spark, sf_dir).collect()}
    docs = io.load_table(spark, sf_dir, "documents").collect()
    ordered = sorted(docs, key=lambda d: (-d.n_chars, d.doc_id))
    cum = 0
    expect = {}
    for d in ordered:
        n_tok = len(d.text.split(" "))
        cum += n_tok
        if cum > 30_000:
            break
        expect[d.doc_id] = (n_tok, cum)
    assert {k: (r.n_tok, r.cum_tokens) for k, r in rows.items()} == expect


def test_session_window_consistent_with_islands(spark, sf_dir):
    """Native session_window and the gaps-and-islands form agree on
    session counts per user when no gap sits exactly on the 30-min
    boundary (where their >= / > semantics intentionally differ)."""
    native = QUERIES["agg_session_window"](spark, sf_dir).collect()
    islands = QUERIES["ts_sessionize"](spark, sf_dir).collect()
    n_native = defaultdict(int)
    for r in native:
        n_native[r.user_id] += 1
    n_islands = defaultdict(int)
    for r in islands:
        n_islands[r.user_id] += 1
    # exact-boundary gaps would make native split one more session
    assert all(n_native[u] >= n_islands[u] for u in n_islands)
    diff = sum(n_native[u] - n_islands[u] for u in n_islands)
    assert diff == 0, f"{diff} exact-30min boundary gaps in fixture"
    # native session_end must be last event + 30 min > session_start
    for r in native:
        assert r.session_end > r.session_start


def test_agg_grouping_id_bitmask(spark, sf_dir):
    """gid encodes which columns are rolled up: 0 = detail rows, 1 =
    priority subtotals, 3 = grand total; counts reconcile across levels."""
    rows = QUERIES["agg_grouping_id"](spark, sf_dir).collect()
    by_gid = defaultdict(list)
    for r in rows:
        by_gid[r.gid].append(r)
    assert set(by_gid) == {0, 1, 3}
    total = sum(r.n for r in by_gid[0])
    assert sum(r.n for r in by_gid[1]) == total
    [grand] = by_gid[3]
    assert grand.n == total and grand.status == "ALL" and grand.priority == "ALL"
    for r in by_gid[1]:
        assert r.priority == "ALL" and r.status != "ALL"


def test_join_nearest_matches_bruteforce(spark, sf_dir):
    """Banded nearest matches the brute-force theta scan."""
    got = {r.s_suppkey: (r.nearest_cust, r.dist)
           for r in QUERIES["join_nearest"](spark, sf_dir).collect()}
    sup = io.load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal").collect()
    cust = io.load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").collect()
    for s in sup:
        best = None
        for c in cust:
            d = abs(s.s_acctbal - c.c_acctbal)
            if d <= 500.0 and (best is None or (d, c.c_custkey) < best):
                best = (d, c.c_custkey)
        if best is None:
            assert s.s_suppkey not in got
        else:
            nc, dd = got[s.s_suppkey]
            assert nc == best[1] and abs(dd - round(best[0], 2)) < 1e-9
