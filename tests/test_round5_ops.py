"""Semantic cross-checks for the round-5 curation batch, independent of
the DuckDB oracles: each scalable implementation is compared against a
brute-force reference computed in plain Python on the same fixture rows.
"""

from __future__ import annotations

from hh_rumors_presto_spark.queries.curation_round5 import (
    _BPE_MERGES,
    _CONT_N,
    _CUR_MAX_WORDS,
    _CUR_MIN_WL,
    _CUR_MIN_WORDS,
    _CUR_SRC_CAP,
    _SEM_K,
    _SEM_THETA,
)
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _embeddings(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


def test_semantic_dedup_matches_bruteforce(spark, sf_dir):
    """Cluster-blocked pruning must equal the brute-force SemDeDup rule:
    assign to nearest of the first-k centroids, then a vector is a dup iff
    a smaller vec_id in the SAME cluster has cosine > theta."""
    vecs = _embeddings(spark, sf_dir)
    cents = {i: vecs[i] for i in range(_SEM_K)}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den

    assign = {
        v: min(cents, key=lambda c: (d2(vec, cents[c]), c))
        for v, vec in vecs.items()
    }
    want_dup = set()
    by_cluster: dict[int, list[int]] = {}
    for v, c in assign.items():
        by_cluster.setdefault(c, []).append(v)
    for members in by_cluster.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if cos(vecs[a], vecs[b]) > _SEM_THETA:
                    want_dup.add(b)

    rows = QUERIES["dedup_semantic"](spark, sf_dir).collect()
    got_assign = {r.vec_id: r.centroid_id for r in rows}
    got_dup = {r.vec_id for r in rows if r.is_dup}
    assert got_assign == assign
    assert got_dup == want_dup
    assert want_dup, "fixture produced no duplicates — test is vacuous"
    # the pruned survivor set keeps at least the smallest id per cluster
    for members in by_cluster.values():
        assert members[0] not in want_dup


def _bpe_encode_word(word: str) -> list[str]:
    """Reference BPE: iteratively merge the leftmost occurrence of the
    current rule until the rule no longer applies, rules in table order."""
    syms = list(word)
    for pat, rep in _BPE_MERGES:
        a, b = pat.split(" ")
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(rep)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference_merges(spark, sf_dir):
    """The substring-replace chain must equal true pairwise BPE merging
    (the _BPE_MERGES table is constructed to guarantee this)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    import re

    want = {}
    for r in docs:
        words = [w for w in re.sub(r"[^a-z ]", "", r.text.lower()).split(" ") if w]
        want[r.doc_id] = (
            len(words),
            sum(len(_bpe_encode_word(w)) for w in words),
        )
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in QUERIES["text_bpe_encode"](spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_merge_reduces_tokens(spark, sf_dir):
    rows = QUERIES["text_bpe_encode"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    import re

    fired = 0
    for r in rows:
        clean = re.sub(r"[^a-z ]", "", docs[r.doc_id].lower())
        n_chars = sum(len(w) for w in clean.split(" ") if w)
        assert r.n_tokens <= n_chars
        if r.n_tokens < n_chars:
            fired += 1
    assert fired > 0, "no merge ever fired — table is vacuous on fixture"


def test_curation_pipeline_stages_all_bite(spark, sf_dir):
    """Each stage of the composite must be observable: the filter drops
    rows, and the per-source cap truncates at least one source."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    survivors = QUERIES["curation_pipeline_e2e"](spark, sf_dir).collect()

    def stats(text):
        words = [w for w in text.split(" ") if w]
        return len(words), sum(len(w) for w in words) / len(words)

    filtered = [
        r
        for r in docs
        if _CUR_MIN_WORDS <= stats(r.text)[0] <= _CUR_MAX_WORDS
        and stats(r.text)[1] >= _CUR_MIN_WL
    ]
    assert len(filtered) < len(docs), "filter stage never fired"
    per_src: dict[str, int] = {}
    for r in filtered:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert any(v > _CUR_SRC_CAP for v in per_src.values()), "cap never fired"
    got_per_src: dict[str, int] = {}
    for r in survivors:
        got_per_src[r.source] = got_per_src.get(r.source, 0) + 1
        assert r.src_rank <= _CUR_SRC_CAP
    assert all(v <= _CUR_SRC_CAP for v in got_per_src.values())
    assert survivors


def test_containment_matches_bruteforce(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def grams(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + _CONT_N])
            for i in range(len(toks) - _CONT_N + 1)
        }

    ev = {r.doc_id: grams(r.text) for r in docs if r.doc_id % 97 == 0}
    tr = {r.doc_id: grams(r.text) for r in docs if r.doc_id % 97 != 0}
    want = {}
    for t, tg in tr.items():
        for e, eg in ev.items():
            common = len(tg & eg)
            if common:
                want[(t, e)] = (common, round(common / len(eg), 6))
    got = {
        (r.train_doc, r.eval_doc): (r.n_common, round(r.containment, 6))
        for r in QUERIES["text_containment"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "no containment pairs on fixture — test is vacuous"


def test_holt_winters_matches_direct_recursion(spark, sf_dir):
    """applyInPandas output == the textbook two-state recursion computed
    row-by-row in plain Python for every series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = sorted(
        (
            (r.user_id, r.ts, r.event_id, float(r.value))
            for r in ev.collect()
            if r.value is not None
        ),
    )
    want = {}
    state: dict[int, tuple[float, float]] = {}
    for user, _, eid, y in rows:
        if user not in state:
            level, trend = y, 0.0
        else:
            level, trend = state[user]
            prev = level
            level = 0.5 * y + 0.5 * (level + trend)
            trend = 0.5 * (level - prev) + 0.5 * trend
        state[user] = (level, trend)
        want[(user, eid)] = (level, trend)
    got = {
        (r.user_id, r.event_id): (r.level, r.trend)
        for r in QUERIES["ts_holt_winters"](spark, sf_dir).collect()
    }
    assert got == want  # bit-exact, not approx


def test_pit_join_never_leaks_future(spark, sf_dir):
    """No feature timestamp may exceed its spine timestamp, and the
    picked feature must be the true latest at-or-before."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    out = QUERIES["join_pit_multi"](spark, sf_dir).collect()
    ev_by_id = {r.event_id: r for r in ev}
    n_matched = 0
    for row in out:
        spine = ev_by_id[row.spine_id]
        for typ, got_id in (
            ("click", row.click_event_id),
            ("view", row.view_event_id),
        ):
            cands = [
                r
                for r in by_user[row.user_id]
                if r.event_type == typ and r.ts <= spine.ts
            ]
            if not cands:
                assert got_id is None
                continue
            n_matched += 1
            best = max(cands, key=lambda r: (r.ts, r.event_id))
            assert got_id == best.event_id
    assert n_matched, "no PIT matches on fixture — test is vacuous"


def test_seasonal_decompose_identity_and_full_windows(spark, sf_dir):
    """resid == n - trend - seasonal (up to the 1e-6 output rounding) on
    every row, and the trend exists exactly where the 25-hour window is
    complete."""
    rows = QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect()
    assert rows
    per_type: dict[str, int] = {}
    for r in rows:
        per_type[r.event_type] = per_type.get(r.event_type, 0) + 1
        if r.trend is not None:
            assert r.seasonal is not None and r.resid is not None
            assert abs(r.resid - (r.n - r.trend - r.seasonal)) < 3e-6
    counts = set(per_type.values())
    assert len(counts) == 1, "every type must cover the same dense grid"


def test_target_encode_loo_excludes_own_row(spark, sf_dir):
    """Leave-one-out: rows of the same category with different targets
    must get different encodings, shifted the right way."""
    out = QUERIES["feat_target_encode"](spark, sf_dir).collect()
    orders = {
        r.o_orderkey: (r.o_orderpriority, 1 if r.o_orderstatus == "F" else 0)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    by_cat: dict[str, dict[int, float]] = {}
    for r in out:
        by_cat.setdefault(r.category, {})[r.o_orderkey] = r.target_enc
    checked = 0
    for cat, encs in by_cat.items():
        pos = [k for k in encs if orders[k][1] == 1]
        neg = [k for k in encs if orders[k][1] == 0]
        if pos and neg:
            # removing a positive own-row lowers the numerator -> smaller enc
            assert encs[pos[0]] < encs[neg[0]]
            checked += 1
    assert checked, "fixture had single-target categories only — vacuous"


def test_hll_matches_reference_implementation(spark, sf_dir):
    """The register table and estimate must equal a from-scratch Python
    HLL over the same md5 hashes, and the error must sit inside the
    theoretical band for m=256."""
    import hashlib

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    regs: dict[tuple[str, int], int] = {}
    truth: dict[str, set] = {}
    for r in li:
        hx = hashlib.md5(str(r.l_partkey).encode()).hexdigest()
        bucket = int(hx[:2], 16)
        rem = hx[2:15]
        stripped = rem.lstrip("0")
        if not stripped:
            rho = 4 * 13 + 1
        else:
            nib = int(stripped[0], 16)
            extra = 3 if nib == 1 else 2 if nib < 4 else 1 if nib < 8 else 0
            rho = 4 * (13 - len(stripped)) + extra + 1
        key = (r.l_returnflag, bucket)
        regs[key] = max(regs.get(key, 0), rho)
        truth.setdefault(r.l_returnflag, set()).add(r.l_partkey)

    m = 256
    want = {}
    for grp in truth:
        ms = [v for (g, _), v in regs.items() if g == grp]
        sum_scaled = sum(2 ** (53 - v) for v in ms)
        v_empty = m - len(ms)
        raw = (
            (0.7213 / (1.0 + 1.079 / m)) * m * m * 9007199254740992.0
        ) / float(sum_scaled + v_empty * 9007199254740992)
        if raw <= 2.5 * m and v_empty > 0:
            import math

            raw = m * math.log(m / float(v_empty))
        want[grp] = (round(raw, 4), len(truth[grp]))

    out = QUERIES["sketch_hll_det"](spark, sf_dir).collect()
    for r in out:
        est, ndv = want[r.l_returnflag]
        assert r.hll_est == est
        assert r.exact_ndv == ndv
        assert r.rel_err < 3 * 1.04 / (m ** 0.5), "outside 3x std-error band"


def test_ccnet_buckets_are_ordered_tertiles(spark, sf_dir):
    """head scores >= middle scores >= tail scores, and the three buckets
    are tertile-sized (within interpolation slack)."""
    rows = QUERIES["corpus_ccnet_buckets"](spark, sf_dir).collect()
    by_bucket: dict[str, list[float]] = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by_bucket[r.bucket].append(r.avg_logp)
    n = len(rows)
    assert all(by_bucket.values()), "a bucket is empty"
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    for sizes in by_bucket.values():
        assert abs(len(sizes) - n / 3) <= 2


def test_ccnet_buckets_empty_corpus_yields_empty(spark, sf_dir, tmp_path):
    """ADVICE r8 (breadth_round6): with zero documents the ungrouped cuts
    agg still emits one n=0 row, and an unguarded element_at(arr, 0)
    raises INVALID_INDEX_OF_ZERO while the DuckDB oracle returns empty —
    a crash-vs-empty divergence. The cut row is now filtered on n > 0 in
    both engines; empty in must be empty out, not an error."""
    import pyarrow.parquet as pq

    src = pq.read_table(f"{sf_dir}/documents.parquet")
    pq.write_table(src.slice(0, 0), str(tmp_path / "documents.parquet"))
    out = QUERIES["corpus_ccnet_buckets"](spark, str(tmp_path)).collect()
    assert out == []


def test_aqp_sample_is_the_exact_hash_subset(spark, sf_dir):
    """The 10% sample must be exactly the md5-predicate subset (no
    TABLESAMPLE nondeterminism), and the measured error small."""
    import hashlib

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    want_rows: dict[str, int] = {}
    for r in li:
        key = f"{r.l_orderkey}-{r.l_linenumber}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 100
        if h < 10:
            want_rows[r.l_returnflag] = want_rows.get(r.l_returnflag, 0) + 1
    out = QUERIES["aqp_sample_mean"](spark, sf_dir).collect()
    for r in out:
        assert r.sample_rows == want_rows[r.l_returnflag]
        # rel std error of the mean ~ sigma/(mu*sqrt(n)) ~ 4% at the
        # sf0.001 sample size (n~180); 0.15 is a ~3.5-sigma ceiling
        assert r.rel_err < 0.15


def test_xml_roundtrip_preserves_rows(spark, sf_dir):
    """Row-level check beyond the aggregate oracle: writing + reading the
    XML loses or mutates nothing, including the free-text column."""
    import os
    import shutil
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"hh_test_xml_{spark.sparkContext.applicationId}",
    )
    try:
        docs.write.mode("overwrite").format("xml").option(
            "rowTag", "doc"
        ).save(out)
        back = (
            spark.read.format("xml")
            .option("rowTag", "doc")
            .schema("doc_id long, text string, lang string")
            .load(out)
        )
        want = {(r.doc_id, r.text, r.lang) for r in docs.collect()}
        got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pipe_syntax_equals_dataframe_plan(spark, sf_dir):
    """The |> pipeline must produce exactly what the equivalent DataFrame
    chain produces."""
    from pyspark.sql import functions as F

    got = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.avg_price, r.n)
        for r in QUERIES["sql_pipe_syntax"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want_df = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") > 10)
    )
    want = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.avg_price, r.n)
        for r in want_df.collect()
    }
    assert got == want


def test_sql_scripting_threshold_math(spark, sf_dir):
    """The WHILE loop's compounded threshold must equal the literal
    five-multiplication value, proven through the row counts."""
    from pyspark.sql import functions as F

    thr = 1000.0
    for _ in range(5):
        thr = thr * 1.1
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r.o_orderpriority: r.n
        for r in orders.filter(F.col("o_totalprice") > thr)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        r.o_orderpriority: r.n_big
        for r in QUERIES["sql_scripting"](spark, sf_dir).collect()
    }
    assert got == want
    assert sum(want.values()) > 0, "threshold filtered everything — vacuous"


def test_logreg_gd_matches_numpy_reference(spark, sf_dir):
    """The in-plan gradient descent must match a numpy replay of the same
    iterations (same rounding discipline), and the fit must beat the
    majority-class baseline or at least match it."""
    import numpy as np

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    X = np.array(
        [
            [1.0, r.o_totalprice / 100000.0, int(r.o_orderpriority[0]) / 5.0]
            for r in orders
        ]
    )
    y = np.array([1.0 if r.o_orderstatus == "F" else 0.0 for r in orders])
    w = np.zeros(3)
    for _ in range(3):
        z = (w[0] * X[:, 0] + w[1] * X[:, 1]) + w[2] * X[:, 2]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.array(
            [round(float(np.mean((p - y) * X[:, j])), 12) for j in range(3)]
        )
        w = w - 1.0 * g
    z = (w[0] * X[:, 0] + w[1] * X[:, 1]) + w[2] * X[:, 2]
    acc = float(np.mean((z >= 0) == (y == 1.0)))

    [row] = QUERIES["ml_logreg_gd"](spark, sf_dir).collect()
    assert (row.w1, row.w2, row.w3) == tuple(round(float(x), 6) for x in w)
    assert row.train_acc == round(acc, 6)
    assert row.n_rows == len(orders)
    majority = max(float(np.mean(y)), 1.0 - float(np.mean(y)))
    assert row.train_acc >= round(majority, 6) - 1e-9


def test_pca_power_matches_numpy_replay(spark, sf_dir):
    """The in-plan fixed-point power iteration must equal a numpy replay
    of the same quantized steps, and must concentrate more variance than
    the starting vector (power iteration actually converged upward)."""
    import math

    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    V = np.array([[float(x) for x in r.embedding] for r in emb])
    S = 1_000_000
    mu = V.mean(axis=0)
    C = np.floor((V - mu) * S + 0.5).astype(np.int64)
    w = np.array([S if (d + 1) % 2 == 1 else -S for d in range(64)], np.int64)
    w0 = w.astype(float)
    for _ in range(3):
        dot = C @ w  # exact in int64 (bounds checked in the impl docstring)
        sv = np.floor(dot.astype(float) / float(S)).astype(np.int64)
        g = C.T @ sv
        nrm = math.sqrt(float(np.sum(g.astype(float) ** 2)))
        w = np.floor(g.astype(float) / nrm * S + 0.5).astype(np.int64)
    want = {d + 1: w[d] / float(S) for d in range(64)}
    got = {
        r.dim: r.loading
        for r in QUERIES["emb_pca_power"](spark, sf_dir).collect()
    }
    assert got == want

    # variance along the result beats variance along the start vector
    X = V - mu
    wf = np.array([want[d + 1] for d in range(64)])
    var_final = float(np.sum((X @ wf) ** 2)) / float(np.dot(wf, wf))
    var_start = float(np.sum((X @ w0) ** 2)) / float(np.dot(w0, w0))
    assert var_final > var_start
    assert abs(float(np.linalg.norm(wf)) - 1.0) < 1e-3


def test_bpe_fertility_consistent_with_encode(spark, sf_dir):
    """Fertility per language must equal the ratio of text_bpe_encode's
    own per-doc sums grouped by lang."""
    enc = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in QUERIES["text_bpe_encode"](spark, sf_dir).collect()
    }
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    want: dict[str, list[int]] = {}
    for d, (nw, nt) in enc.items():
        if nw > 0:
            acc = want.setdefault(langs[d], [0, 0])
            acc[0] += nw
            acc[1] += nt
    got = QUERIES["text_bpe_fertility"](spark, sf_dir).collect()
    assert {r.lang for r in got} == set(want)
    for r in got:
        nw, nt = want[r.lang]
        assert (r.total_words, r.total_tokens) == (nw, nt)
        assert r.fertility == round(nt / nw, 6)
        assert r.fertility >= 1.0  # every word is at least one token


def test_hll_setops_union_is_register_max(spark, sf_dir):
    """Union-sketch estimate must equal an HLL built directly on the
    union set (register-max == union is the mergeability property), and
    the intersection estimate must be within the theoretical error of
    the exact intersection."""
    import hashlib

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()

    def regs_for(pred):
        regs: dict[int, int] = {}
        vals = set()
        for r in li:
            if pred(r):
                vals.add(r.l_partkey)
        for v in vals:
            hx = hashlib.md5(str(v).encode()).hexdigest()
            bucket = int(hx[:2], 16)
            stripped = hx[2:15].lstrip("0")
            if not stripped:
                rho = 53
            else:
                nib = int(stripped[0], 16)
                extra = 3 if nib == 1 else 2 if nib < 4 else 1 if nib < 8 else 0
                rho = 4 * (13 - len(stripped)) + extra + 1
            regs[bucket] = max(regs.get(bucket, 0), rho)
        return regs, vals

    in_a = lambda r: r.l_partkey % 3 < 2
    in_b = lambda r: r.l_partkey % 2 == 0
    ra, va = regs_for(in_a)
    rb, vb = regs_for(in_b)
    ru, vu = regs_for(lambda r: in_a(r) or in_b(r))
    # register-max merge == registers of the union set
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == ru

    def est(regs):
        import math

        m = 256
        ss = sum(2 ** (53 - v) for v in regs.values())
        v_empty = m - len(regs)
        raw = (
            (0.7213 / (1.0 + 1.079 / m)) * m * m * 9007199254740992.0
        ) / float(ss + v_empty * 9007199254740992)
        if raw <= 2.5 * m and v_empty > 0:
            return m * math.log(m / float(v_empty))
        return raw

    [row] = QUERIES["sketch_hll_setops"](spark, sf_dir).collect()
    assert row.est_union == round(est(ru), 4)
    assert row.exact_union == len(vu)
    assert row.exact_intersect == len(va & vb)
    # intersection via inclusion-exclusion: 3 estimates' errors compound;
    # allow 3 x 3 x std-error of the smallest set
    # errors of the three estimates compound and scale with the UNION
    # size, not the intersection size
    tol = 9 * 1.04 / (256 ** 0.5) * max(len(vu), 1)
    assert abs(row.est_intersect - len(va & vb)) < tol


def test_pmi_matches_bruteforce(spark, sf_dir):
    """Top-k collocations must equal a plain-Python PMI computation."""
    import math

    from hh_rumors_presto_spark.queries.curation_round5 import (
        _PMI_MIN_COUNT,
        _PMI_TOP_K,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for r in docs:
        t = r.text.split(" ")
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    T = sum(uni.values())
    B = sum(big.values())
    scored = [
        (
            math.log((n / B) / ((uni[a] / T) * (uni[b] / T))),
            a,
            b,
            n,
        )
        for (a, b), n in big.items()
        if n >= _PMI_MIN_COUNT
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = [
        (a, b, n, round(p, 6)) for p, a, b, n in scored[:_PMI_TOP_K]
    ]
    got = [
        (r.w1, r.w2, r.n_ab, r.pmi)
        for r in QUERIES["text_collocations_pmi"](spark, sf_dir).collect()
    ]
    assert got == want
    assert want, "no collocations above the support floor — vacuous"


def test_link_predict_matches_bruteforce(spark, sf_dir):
    """Wedge-join link prediction must equal brute-force neighbor-set
    Jaccard over unconnected distance-2 pairs."""
    from hh_rumors_presto_spark.registry import QUERIES as Q

    pairs = {
        (r.doc_a, r.doc_b)
        for r in Q["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    neigh: dict[int, set] = {}
    for a, b in pairs:
        neigh.setdefault(a, set()).add(b)
        neigh.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(neigh)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in pairs:
                continue
            common = neigh[u] & neigh[v]
            if common:
                want[(u, v)] = (
                    len(common),
                    round(len(common) / len(neigh[u] | neigh[v]), 6),
                )
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.neighbor_jaccard)
        for r in QUERIES["graph_link_predict"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "no distance-2 candidates on fixture — vacuous"


def test_freshness_lags_are_exact(spark, sf_dir):
    rows = QUERIES["dq_freshness"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per = {}
    for r in ev:
        t = r.ts
        per[r.event_type] = max(per.get(r.event_type, t), t)
    gmax = max(per.values())
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        lag_us = int((gmax - per[r.event_type]).total_seconds() * 1_000_000)
        assert r.lag_minutes == lag_us // 60_000_000
        assert r.sla_breach == (lag_us > 120 * 60_000_000)


def test_tokenize_pack_invariants(spark, sf_dir):
    """Packs fill contiguously per shard: offsets advance by n_tokens
    modulo CTX, every doc carries the +2 special-token overhead, and the
    admission filter dropped short docs."""
    from hh_rumors_presto_spark.queries.curation_round5 import (
        _TP_CTX,
        _TP_SHARDS,
        _TP_SPECIAL,
    )
    import re

    rows = QUERIES["pipeline_tokenize_pack"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    n_clean = {
        d: len([w for w in re.sub(r"[^a-z ]", "", t.lower()).split(" ") if w])
        for d, t in docs.items()
    }
    assert {r.doc_id for r in rows} == {
        d for d, n in n_clean.items() if n >= 5
    }
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.shard == r.doc_id % _TP_SHARDS
        assert r.n_tokens > _TP_SPECIAL
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in shard_rows:
            assert r.pack_id == cum // _TP_CTX
            assert r.pack_offset == cum % _TP_CTX
            cum += r.n_tokens


def test_quantize_error_matches_numpy(spark, sf_dir):
    """Per-label mean MSE and worst cosine must equal a numpy replay of
    the same explicit quantizer, and the error floor must be tight (int8
    on unit-scale vectors: cosine stays ~1)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    per_label: dict[int, list] = {}
    for r in emb:
        v = np.array([float(x) for x in r.embedding])
        s = np.abs(v).max() / 127.0
        if s <= 0:
            continue
        q = np.floor(v / s + 0.5) * s
        mse = float(np.mean((v - q) ** 2))
        cos = float(
            np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))
        )
        per_label.setdefault(r.label, []).append((mse, cos))
    got = {
        r.label: (r.mean_mse, r.worst_cosine, r.n_vectors)
        for r in QUERIES["emb_quantize_error"](spark, sf_dir).collect()
    }
    for label, vals in per_label.items():
        mean_mse = round(sum(m for m, _ in vals) / len(vals), 9)
        worst = round(min(c for _, c in vals), 6)
        gm, gw, gn = got[label]
        assert gn == len(vals)
        assert abs(gm - mean_mse) < 2e-9
        assert abs(gw - worst) < 2e-6
        assert gw > 0.999, "int8 reconstruction should stay near-parallel"


def test_calendar_join_dense_and_zero_filled(spark, sf_dir):
    """The calendar spine must be gap-free from min to max order date,
    weekend flags must match Python's weekday(), and zero-fill days must
    exist (or every day had orders — then the test asserts density only)."""
    rows = {r.cal_date: r for r in QUERIES["dim_calendar_join"](spark, sf_dir).collect()}
    import datetime

    dmin, dmax = min(rows), max(rows)
    d = dmin
    while d <= dmax:
        assert d in rows, f"gap at {d}"
        r = rows[d]
        iso = d.isoweekday()
        assert r.iso_dow == iso
        assert r.is_weekend == (iso >= 6)
        d += datetime.timedelta(days=1)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    per_day: dict = {}
    import datetime as _dt

    for o in orders:
        # older fixtures store o_orderdate as a midnight timestamp
        d0 = (
            o.o_orderdate.date()
            if isinstance(o.o_orderdate, _dt.datetime)
            else o.o_orderdate
        )
        per_day[d0] = per_day.get(d0, 0) + 1
    for d, r in rows.items():
        assert r.n_orders == per_day.get(d, 0)


def test_provenance_counts_match_file(spark, sf_dir):
    [row] = QUERIES["scan_provenance"](spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert row.file_name == "orders.parquet"
    assert row.n_rows == orders.count()


def test_join_skew_stats_match_bruteforce(spark, sf_dir):
    [row] = QUERIES["dq_join_skew"](spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    freq: dict[int, int] = {}
    for o in orders:
        freq[o.o_custkey] = freq.get(o.o_custkey, 0) + 1
    assert row.n_keys == len(freq)
    assert row.n_rows == len(orders)
    assert row.max_n == max(freq.values())
    assert row.skew_ratio == round(
        max(freq.values()) / (len(orders) / len(freq)), 6
    )
    hottest = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    assert row.hottest_key == hottest


def test_embedding_drift_is_noise_floor(spark, sf_dir):
    """Same-distribution halves: the measured shift must equal the
    brute-force centroid distance and sit well below the raw embedding
    scale (it is a noise floor, not real drift)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    halves: dict[tuple[int, int], list] = {}
    for r in emb:
        halves.setdefault((r.label, r.vec_id % 2), []).append(
            np.array([float(x) for x in r.embedding])
        )
    got = {
        r.label: (r.centroid_shift, r.n_dims)
        for r in QUERIES["dq_embedding_drift"](spark, sf_dir).collect()
    }
    labels = {l for l, _ in halves}
    for label in labels:
        qa = [np.floor(v * 1e6 + 0.5) for v in halves[(label, 0)]]
        qb = [np.floor(v * 1e6 + 0.5) for v in halves[(label, 1)]]
        a = np.mean(qa, axis=0)
        b = np.mean(qb, axis=0)
        want = round(float(np.linalg.norm(a - b)) / 1e6, 6)
        shift, n_dims = got[label]
        assert n_dims == 64
        assert abs(shift - want) < 2e-6
        assert shift < 1.0, "same-distribution halves should not 'drift'"


def test_scd2_asof_exactly_one_version_per_key(spark, sf_dir):
    """The AS-OF reconstruction must return exactly one version per
    customer, and it must be the version whose interval contains the
    lookup date in the full version table."""
    import datetime

    d = datetime.date(1997, 6, 1)
    versions = QUERIES["scd2_merge"](spark, sf_dir).collect()
    want = {}
    for v in versions:
        vf = v.valid_from
        vt = v.valid_to
        if vf <= d and (vt is None or d < vt):
            assert v.c_custkey not in want, "overlapping versions"
            want[v.c_custkey] = (round(v.bal, 2), vf)
    got = {
        r.c_custkey: (r.bal, r.valid_from)
        for r in QUERIES["scd2_asof_lookup"](spark, sf_dir).collect()
    }
    assert got == want
    all_keys = {v.c_custkey for v in versions}
    assert set(got) == all_keys, "a customer vanished from the as-of view"


def test_forecast_backtest_matches_bruteforce(spark, sf_dir):
    """MAE/WAPE must equal a brute-force seasonal-naive backtest on the
    densified hourly series, and the forecast must never peek forward."""
    import datetime

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()

    def hour(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    counts: dict[tuple[str, object], int] = {}
    for r in ev:
        k = (r.event_type, hour(r.ts))
        counts[k] = counts.get(k, 0) + 1
    tmin = hour(min(r.ts for r in ev))
    tmax = hour(max(r.ts for r in ev))
    types = {r.event_type for r in ev}
    want = {}
    for t in types:
        series = []
        cur = tmin
        while cur <= tmax:
            series.append(counts.get((t, cur), 0))
            cur += datetime.timedelta(hours=1)
        tail = series[-(48 + 24):]
        errs = [
            abs(tail[i] - tail[i - 24]) for i in range(24, len(tail))
        ]
        actual = [tail[i] for i in range(24, len(tail))]
        want[t] = (
            len(errs),
            sum(errs),
            round(sum(errs) / len(errs), 6),
            round(sum(errs) / sum(actual), 6) if sum(actual) else None,
        )
    got = {
        r.event_type: (r.n_points, r.abs_err_total, r.mae, r.wape)
        for r in QUERIES["ts_forecast_backtest"](spark, sf_dir).collect()
    }
    assert got == want


def test_corpus_build_e2e_matches_bruteforce(spark, sf_dir):
    """The one-plan corpus build must equal a plain-Python replay of
    every stage: admission, exact dedup, head dedup, salted split, BPE
    token counts, shard stats."""
    import hashlib
    import re

    from hh_rumors_presto_spark.queries.curation_round5 import (
        _E2E_CTX,
        _E2E_MIN_WORDS,
        _E2E_SHARDS,
        _E2E_VAL_PCT,
    )

    docs = sorted(
        spark.read.parquet(f"{sf_dir}/documents.parquet").collect(),
        key=lambda r: r.doc_id,
    )
    seen_exact, seen_head = set(), set()
    agg: dict[tuple[str, int], list[int]] = {}
    for r in docs:
        wlist = [
            w for w in re.sub(r"[^a-z ]", "", r.text.lower()).split(" ") if w
        ]
        if len(wlist) < _E2E_MIN_WORDS:
            continue
        fp_exact = hashlib.md5(r.text.encode()).hexdigest()
        if fp_exact in seen_exact:
            continue
        seen_exact.add(fp_exact)
        fp_head = hashlib.md5(r.text[:32].encode()).hexdigest()
        if fp_head in seen_head:
            continue
        seen_head.add(fp_head)
        sh = int(
            hashlib.md5(f"split:{r.doc_id}".encode()).hexdigest()[:15], 16
        ) % 100
        split = "val" if sh < _E2E_VAL_PCT else "train"
        n_tok = sum(len(_bpe_encode_word(w)) for w in wlist) + 2
        doc_fp = int(fp_exact[:15], 16) % 1099511627776
        acc = agg.setdefault((split, r.doc_id % _E2E_SHARDS), [0, 0, 0])
        acc[0] += 1
        acc[1] += n_tok
        acc[2] += doc_fp
    want = {
        k: (v[0], v[1], (v[1] + _E2E_CTX - 1) // _E2E_CTX, v[2])
        for k, v in agg.items()
    }
    got = {
        (r.split, r.shard): (
            r.n_docs,
            r.total_tokens,
            r.n_packs,
            r.content_checksum,
        )
        for r in QUERIES["corpus_build_e2e"](spark, sf_dir).collect()
    }
    assert got == want
    assert len(want) > 1 and any(k[0] == "val" for k in want)


def test_merge_upsert_four_branch_semantics(spark, sf_dir):
    """Replay the three-clause MERGE in plain Python from the raw
    fixtures: matched+hot -> deleted, matched -> exact decimal add,
    source-only -> insert with spend balance, target-only -> keep."""
    from decimal import Decimal

    cust = {
        r.c_custkey: (r.c_name, r.c_acctbal)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    src = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        key = -r.o_custkey if r.o_custkey % 10 == 0 else r.o_custkey
        n, tot = src.get(key, (0, Decimal(0)))
        src[key] = (n + 1, tot + Decimal(repr(r.o_totalprice)))
    want = {}
    for key, (name, bal) in cust.items():
        if key in src:
            n, tot = src[key]
            if n >= 15:
                continue  # WHEN MATCHED AND hot THEN DELETE
            spend = float(
                tot.quantize(Decimal("0.01"), rounding="ROUND_HALF_UP")
            )
            new_bal = float(
                Decimal(repr(round(bal, 2))) + Decimal(repr(spend))
            )
            want[key] = (name, new_bal, "update")
        else:
            want[key] = (name, bal, "keep")
    for key, (n, tot) in src.items():
        if key not in cust:
            spend = float(
                tot.quantize(Decimal("0.01"), rounding="ROUND_HALF_UP")
            )
            want[key] = (f"NEW#{key}", spend, "insert")
    got = {
        r.c_custkey: (r.c_name, r.bal, r.op)
        for r in QUERIES["merge_upsert"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for key in want:
        gn, gb, gop = got[key]
        wn, wb, wop = want[key]
        assert (gn, gop) == (wn, wop), key
        assert abs(gb - wb) < 1e-9, (key, gb, wb)
    assert {op for _, _, op in got.values()} == {"insert", "update", "keep"}
