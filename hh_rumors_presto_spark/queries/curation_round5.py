"""Round-5 curation batch: semantic dedup, BPE application, an end-to-end
curation composite, and pairwise n-gram containment.

These extend the LLM-training-pipeline surface (driver mandate; SURVEY.md
§2.C) past the per-primitive keys with the composed shapes a production
corpus build actually runs:

- ``dedup_semantic`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  k-means-cluster the embedding space, then prune near-duplicates ONLY
  within a cluster. The pair search is blocked by centroid assignment
  (sum-of-cluster-squares work, never corpus x corpus); at 100 TB the
  centroid count k scales up so block sizes stay bounded while the
  assignment stays a broadcast of k rows.
- ``text_bpe_encode`` — apply a fixed BPE merge table to the corpus (the
  tokenize step of a pretraining build; ``text_bpe_merges`` is the matching
  training step). Pure per-row column expressions — zero shuffle, zero
  Python — and the merge table is chosen so plain left-to-right substring
  replacement is EXACTLY the BPE merge semantics (see the in-function
  proof), which is what makes a DuckDB oracle possible.
- ``curation_pipeline_e2e`` — filter -> exact-dedup -> per-source cap as
  one composed plan, the minimal "real" curation DAG.
- ``text_containment`` — per-(train, eval) asymmetric n-gram containment
  |grams(t) ∩ grams(e)| / |grams(e)| — the direction-sensitive refinement
  of ``text_decontaminate``'s per-train overlap count (quote/inclusion
  detection, not just contact detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.functions import cosine_similarity, dot
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# dedup_semantic
# --------------------------------------------------------------------------

_SEM_K = 8  # centroid count (deterministic seed: first k vec_ids)
_SEM_THETA = 0.35  # cosine threshold (fixture-scaled; prod would use ~0.95)

# dist2 expands as (v.v - 2 v.c) + c.c with identical association in both
# engines (same expression shape as emb_kmeans_assign) so boundary
# assignments agree bit-exactly.
_D2_SQL = (
    "list_inner_product(e.v, e.v) - 2 * list_inner_product(e.v, c.cv)"
    " + list_inner_product(c.cv, c.cv)"
)
_PAIR_COS_SQL = (
    "list_inner_product(a.v, b.v) / nullif("
    "sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))"
    ", 0.0)"
)


@query(
    "dedup_semantic",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {_SEM_K}),
    assign AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_D2_SQL} ASC, c.centroid_id
                   ) AS rn
            FROM e JOIN cent c ON true
        ) WHERE rn = 1
    ),
    dups AS (
        SELECT DISTINCT b.vec_id
        FROM assign a
        JOIN assign b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE {_PAIR_COS_SQL} > {_SEM_THETA}
    )
    SELECT s.vec_id, s.centroid_id, (d.vec_id IS NOT NULL) AS is_dup
    FROM assign s LEFT JOIN dups d ON s.vec_id = d.vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: embedding-cluster-blocked cosine near-dup pruning.

    Shape at scale: (1) assignment = broadcast of the k-row centroid set
    against a single corpus scan (identical to ``emb_kmeans_assign``);
    (2) the candidate pair join is an EQUI-join on centroid_id — no pair is
    ever formed across clusters, so work is sum(|cluster|^2), not n^2, and
    k is the knob that bounds block size at 100 TB; (3) the survivor rule
    (a vector is a duplicate iff a SMALLER vec_id in its cluster exceeds
    the cosine threshold) is a deterministic total order, so the kept set
    is unique. Cosine/dist2 arithmetic matches DuckDB bit-exactly
    (functions/vectors.py), so the threshold compare is engine-stable.
    """
    emb = io.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cent = emb.filter(F.col("vec_id") < _SEM_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    e, c = F.col("embedding"), F.col("c_emb")
    d2 = dot(e, e) - F.lit(2.0) * dot(e, c) + dot(c, c)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("centroid_id")
    )
    # r11 (guide §2.4 + §2.5): materialize the assignment ONCE — it
    # feeds THREE plan legs (both pair-join sides + the final left
    # join), each of which re-ran the n x k distance scan — and
    # repartition by centroid so the within-cluster pair join fans out
    # across tasks instead of the single post-shuffle partition AQE's
    # input-size heuristic planned. Warm sf0.1: 7.0 -> 2.7 s.
    from hh_rumors_presto_spark.session import default_parallelism

    assigned = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "embedding", "centroid_id", d2.alias("dist2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
        .localCheckpoint(eager=False)
        .repartition(default_parallelism(), "centroid_id")
    )
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        "centroid_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        "centroid_id",
    )
    dups = (
        a.join(b, "centroid_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            cosine_similarity(F.col("a_emb"), F.col("b_emb"))
            > F.lit(_SEM_THETA)
        )
        .select(F.col("b_id").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(dups, assigned.vec_id == dups.dup_id, "left")
        .select(
            "vec_id",
            "centroid_id",
            F.col("dup_id").isNotNull().alias("is_dup"),
        )
    )


# --------------------------------------------------------------------------
# text_bpe_encode
# --------------------------------------------------------------------------

# Merge table, applied strictly in order. CHOSEN SO THAT plain non-
# overlapping left-to-right substring replacement on the space-separated
# symbol string is EXACTLY the BPE merge: a pattern "x y" may only match
# where symbol x is adjacent to symbol y, never across a symbol boundary.
# The safety invariant, for each rule in table order: no symbol that can
# exist when the rule runs ENDS WITH x's leading symbol-fragment or
# STARTS WITH y (other than x/y themselves as whole symbols). Here:
#   th,in,an,on,ou,ck: operate on single-char pairs; no multi-char symbol
#     created earlier ends with t/i/a/o/c or starts with h/n/u/k;
#   'th e': the substring "th" can only be the symbol th (rule 1 consumed
#     every adjacent t,h pair), and NO symbol starts with 'e' (this is
#     why 'e r'->'er' is NOT in the table: 'er' would let "th e" match
#     across a th|er boundary — a real counterexample, word 'ther', found
#     by tests/test_properties_round5.py's hypothesis fuzz);
#   'an d': substring "an" only from symbol an; no symbol starts with 'd'.
# No rule pairs identical symbols, so greedy left-to-right == iterative
# leftmost merge. The property test fuzzes this equivalence over the full
# alphabet; it is what makes the DuckDB oracle bit-identical AND actual
# BPE rather than merely deterministic.
_BPE_MERGES = [
    ("t h", "th"),
    ("i n", "in"),
    ("a n", "an"),
    ("o n", "on"),
    ("o u", "ou"),
    ("c k", "ck"),
    ("th e", "the"),
    ("an d", "and"),
]



def _clean_words():
    """Normalized word array column: lowercase, letters+spaces only,
    empty tokens dropped — THE tokenizer input, shared by every BPE key
    so the cleaning spec cannot drift between them."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""), " "),
        lambda x: x != F.lit(""),
    )


def _word_tokens(x):
    """Token count of one word under the merge chain (Spark mirror of
    _bpe_sql_word_expr)."""
    merged = F.trim(F.regexp_replace(x, "(.)", "$1 "))
    for pat, rep in _BPE_MERGES:
        merged = F.replace(merged, F.lit(pat), F.lit(rep))
    return F.size(F.split(merged, " "))


def _bpe_sql_word_expr(var: str) -> str:
    """DuckDB expression: token count of one word after the merge chain."""
    spread = f"trim(regexp_replace({var}, '(.)', '\\1 ', 'g'))"
    merged = spread
    for pat, rep in _BPE_MERGES:
        merged = f"replace({merged}, '{pat}', '{rep}')"
    return f"len(string_split({merged}, ' '))"


@query(
    "text_bpe_encode",
    oracle=f"""
    WITH cleaned AS (
        SELECT doc_id,
               list_filter(
                   string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                   x -> x <> ''
               ) AS words
        FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_words,
           CAST(coalesce(list_sum(list_transform(
               words, x -> {_bpe_sql_word_expr('x')}
           )), 0) AS BIGINT) AS n_tokens
    FROM cleaned
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a fixed BPE merge table and count tokens per document — the
    tokenization/sizing pass of a pretraining data build (the merge table
    itself is what ``text_bpe_merges`` learns).

    Shape at scale: a pure narrow map — normalize, split, and a per-word
    merge chain built ENTIRELY from higher-order functions and string
    replaces, all inside whole-stage codegen. Zero shuffle, zero Python,
    no explode (the per-word token counts fold back with F.aggregate), so
    the operator runs at scan speed on any corpus size. The merge table is
    constructed so substring replacement IS the exact BPE semantics (proof
    at _BPE_MERGES), hence the value-hash DuckDB oracle.
    """
    docs = io.load_table(spark, sf_dir, "documents")
    words = _clean_words()

    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.aggregate(
            F.transform(words, _word_tokens),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# curation_pipeline_e2e
# --------------------------------------------------------------------------

_CUR_MIN_WORDS, _CUR_MAX_WORDS = 20, 80
_CUR_MIN_WL = 4.0  # mean word length lower bound (gopher-style)
_CUR_SRC_CAP = 10  # survivors kept per source


@query(
    "curation_pipeline_e2e",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, n_chars,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
               CAST(list_sum(list_transform(
                   list_filter(string_split(text, ' '), x -> x <> ''),
                   x -> len(x))) AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS mean_wl,
               md5(text) AS fp
        FROM documents
    ),
    filtered AS (
        SELECT * FROM scored
        WHERE n_words BETWEEN {_CUR_MIN_WORDS} AND {_CUR_MAX_WORDS}
          AND mean_wl >= {_CUR_MIN_WL}
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY fp ORDER BY doc_id
            ) AS dup_rn
            FROM filtered
        ) WHERE dup_rn = 1
    )
    SELECT doc_id, source, CAST(n_words AS INT) AS n_words,
           CAST(src_rank AS INT) AS src_rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY n_chars DESC, doc_id
        ) AS src_rank
        FROM deduped
    )
    WHERE src_rank <= {_CUR_SRC_CAP}
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composite: quality filter -> exact dedup ->
    per-source cap, as ONE composed plan (the minimal real corpus-build
    DAG; each stage also exists as its own key: text_gopher_rules,
    dedup_exact, corpus_domain_cap).

    Shape at scale: the filter is a narrow codegen map that runs BEFORE
    any shuffle (cheapest-first stage ordering — the payoff of composing
    stages in one plan is that Catalyst pipelines the filter into the
    scan); dedup and the cap are keyed row_number windows (hash-partition
    by fp / source), both WindowGroupLimit-able; nothing global, nothing
    collected. Word stats via higher-order functions, no explode.
    """
    docs = io.load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    scored = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(words).alias("n_words"),
        (
            F.aggregate(
                F.transform(words, F.length),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size(words)
        ).alias("mean_wl"),
        F.md5("text").alias("fp"),
    )
    filtered = scored.filter(
        F.col("n_words").between(_CUR_MIN_WORDS, _CUR_MAX_WORDS)
        & (F.col("mean_wl") >= _CUR_MIN_WL)
    )
    dup_w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        filtered.withColumn("dup_rn", F.row_number().over(dup_w))
        .filter(F.col("dup_rn") == 1)
    )
    cap_w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        deduped.withColumn("src_rank", F.row_number().over(cap_w))
        .filter(F.col("src_rank") <= _CUR_SRC_CAP)
        .select(
            "doc_id",
            "source",
            F.col("n_words").cast("int").alias("n_words"),
            F.col("src_rank").cast("int").alias("src_rank"),
        )
    )


# --------------------------------------------------------------------------
# text_containment
# --------------------------------------------------------------------------

_CONT_N = 3  # gram width (5-grams are too sparse on the synthetic fixture)


def _tri_gram_sql(src_filter: str) -> str:
    return f"""
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text,' ')) - {_CONT_N - 1}),
                   i -> array_to_string(string_split(text,' ')[i:i+{_CONT_N - 1}], ' ')
               ))) AS gram
        FROM documents
        WHERE {src_filter} AND len(string_split(text,' ')) >= {_CONT_N}
    """


@query(
    "text_containment",
    oracle=f"""
    WITH ev AS ({_tri_gram_sql("doc_id % 97 = 0")}),
    tr AS ({_tri_gram_sql("doc_id % 97 <> 0")}),
    evn AS (SELECT doc_id, count(*) AS n_eval FROM ev GROUP BY doc_id)
    SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
           CAST(count(*) AS BIGINT) AS n_common,
           round(CAST(count(*) AS DOUBLE) / any_value(evn.n_eval), 6)
               AS containment
    FROM tr t
    JOIN ev e ON t.gram = e.gram
    JOIN evn ON evn.doc_id = e.doc_id
    GROUP BY t.doc_id, e.doc_id
    """,
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment per (train, eval) document pair:
    |grams(t) ∩ grams(e)| / |grams(e)| — the direction-sensitive
    contamination score (how much of the EVAL doc appears in a train doc),
    refining ``text_decontaminate``'s per-train overlap count.

    Shape at scale: the eval side (benchmark) is tiny by construction —
    its distinct gram set and per-doc gram counts broadcast; the training
    corpus streams through the broadcast join gram-by-gram and aggregates
    by (train_doc, eval_doc), so the corpus is scanned once and only
    matching grams enter the shuffle (pair-keyed, bounded by real
    overlap, not corpus size).
    """
    docs = io.load_table(spark, sf_dir, "documents")
    toks = F.col("toks")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (_CONT_N - 1)),
            lambda i: F.array_join(F.slice(toks, i, _CONT_N), " "),
        )
    )

    def gram_rows(df):
        return (
            df.select("doc_id", F.split("text", " ").alias("toks"))
            .filter(F.size(toks) >= _CONT_N)
            .select("doc_id", F.explode(grams).alias("gram"))
        )

    ev = gram_rows(docs.filter(F.col("doc_id") % 97 == 0)).withColumnRenamed(
        "doc_id", "eval_doc"
    )
    evn = ev.groupBy("eval_doc").agg(F.count("*").alias("n_eval"))
    tr = gram_rows(docs.filter(F.col("doc_id") % 97 != 0)).withColumnRenamed(
        "doc_id", "train_doc"
    )
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_common"))
        .join(F.broadcast(evn), "eval_doc")
        .select(
            "train_doc",
            "eval_doc",
            "n_common",
            F.round(
                F.col("n_common").cast("double") / F.col("n_eval"), 6
            ).alias("containment"),
        )
    )


# --------------------------------------------------------------------------
# text_bpe_fertility
# --------------------------------------------------------------------------


@query(
    "text_bpe_fertility",
    oracle=f"""
    WITH cleaned AS (
        SELECT doc_id, lang,
               list_filter(
                   string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                   x -> x <> ''
               ) AS words
        FROM documents
    ),
    per_doc AS (
        SELECT lang,
               len(words) AS n_words,
               coalesce(list_sum(list_transform(
                   words, x -> {_bpe_sql_word_expr('x')}
               )), 0) AS n_tokens
        FROM cleaned
    )
    SELECT lang,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words), 6) AS fertility
    FROM per_doc
    WHERE n_words > 0
    GROUP BY lang
    """,
)
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: tokens-per-word under the
    fixed BPE merge table — THE metric for judging whether a tokenizer
    under-serves a language (high fertility = more tokens per word = less
    effective context window and higher training cost for that
    language). Composes text_bpe_encode's zero-shuffle merge chain with
    one keyed integer aggregate; the ratio is derived from exact BIGINT
    sums, so it is bit-deterministic."""
    docs = io.load_table(spark, sf_dir, "documents")
    words = _clean_words()

    per_doc = docs.select(
        "lang",
        F.size(words).alias("n_words"),
        F.aggregate(
            F.transform(words, _word_tokens),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_tokens"),
    ).filter(F.col("n_words") > 0)
    return per_doc.groupBy("lang").agg(
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
    )


# --------------------------------------------------------------------------
# text_collocations_pmi
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5  # support floor (PMI is unstable on rare pairs)
_PMI_TOP_K = 50


@query(
    "text_collocations_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT unnest(t) AS w FROM toks
    ),
    ucnt AS (SELECT w, count(*) AS n FROM uni GROUP BY w),
    utot AS (SELECT sum(n) AS t FROM ucnt),
    big AS (
        SELECT t[i] AS w1, t[i+1] AS w2
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS r(i)
    ),
    bcnt AS (SELECT w1, w2, count(*) AS n_ab FROM big GROUP BY w1, w2),
    btot AS (SELECT sum(n_ab) AS b FROM bcnt)
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln((CAST(n_ab AS DOUBLE) / b)
                    / ((CAST(u1.n AS DOUBLE) / t) * (CAST(u2.n AS DOUBLE) / t))),
                 6) + 0.0 AS pmi
    FROM bcnt
    JOIN ucnt u1 ON u1.w = w1
    JOIN ucnt u2 ON u2.w = w2, utot, btot
    WHERE n_ab >= {_PMI_MIN_COUNT}
    ORDER BY ln((CAST(n_ab AS DOUBLE) / b)
                / ((CAST(u1.n AS DOUBLE) / t) * (CAST(u2.n AS DOUBLE) / t)))
             DESC, w1, w2
    LIMIT {_PMI_TOP_K}
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information: the top
    bigrams whose co-occurrence beats chance — the standard
    phrase-mining / vocabulary-induction pass (precedes multi-word token
    merges in tokenizer training). PMI = ln(p(ab) / (p(a) p(b))) over
    adjacent-pair and unigram counts with a support floor.

    Shape at scale: two keyed integer aggregates (unigrams, bigrams) —
    both map-side combined; the unigram table joins back twice as a
    broadcast (|vocab|-sized); the two totals are one-row broadcasts;
    the final top-k is a TakeOrderedAndProject (partial top-k per
    partition, no global sort). All counts integer-exact; the single ln
    sits at the projection boundary with identical operand doubles in
    both engines."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("n"))
    utot = ucnt.agg(F.sum("n").alias("t"))
    t = F.col("t")
    big = toks.select(
        F.explode(
            F.zip_with(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcnt = big.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    btot = bcnt.agg(F.sum("n_ab").alias("b"))
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    pmi = F.log(
        (F.col("n_ab").cast("double") / F.col("b"))
        / (
            (F.col("n1").cast("double") / F.col("t"))
            * (F.col("n2").cast("double") / F.col("t"))
        )
    )
    return (
        bcnt.filter(F.col("n_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .withColumn("pmi_raw", pmi)
        .orderBy(F.col("pmi_raw").desc(), "w1", "w2")
        .limit(_PMI_TOP_K)
        .select("w1", "w2", "n_ab", (F.round("pmi_raw", 6) + F.lit(0.0)).alias("pmi"))
    )


# --------------------------------------------------------------------------
# pipeline_tokenize_pack
# --------------------------------------------------------------------------

_TP_SHARDS = 8
_TP_CTX = 512
_TP_SPECIAL = 2  # BOS + EOS per document


@query(
    "pipeline_tokenize_pack",
    oracle=f"""
    WITH cleaned AS (
        SELECT doc_id,
               list_filter(
                   string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                   x -> x <> ''
               ) AS words
        FROM documents
    ),
    tokenized AS (
        SELECT doc_id,
               CAST(coalesce(list_sum(list_transform(
                   words, x -> {_bpe_sql_word_expr('x')}
               )), 0) + {_TP_SPECIAL} AS BIGINT) AS n_tokens
        FROM cleaned
        WHERE len(words) >= 5
    ),
    sharded AS (
        SELECT doc_id, doc_id % {_TP_SHARDS} AS shard, n_tokens
        FROM tokenized
    )
    SELECT doc_id, shard, n_tokens,
           CAST(floor(CAST(cum_excl AS DOUBLE) / {_TP_CTX}.0) AS BIGINT)
               AS pack_id,
           CAST(cum_excl % {_TP_CTX} AS BIGINT) AS pack_offset
    FROM (
        SELECT doc_id, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_excl
        FROM sharded
    )
    """,
)
def pipeline_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize -> pack capstone: admission filter (>= 5 clean
    words), REAL BPE token counts (the text_bpe_encode merge chain, not
    a whitespace proxy) plus BOS/EOS overhead, then GPT-style
    concat-and-chunk packing into CTX-token sequences per shard — i.e.
    the numbers a pretraining job actually schedules, end to end in one
    plan.

    Shape at scale: the tokenizer stage is the zero-shuffle HOF chain;
    packing is a per-shard cumulative window (shards pack independently
    — no global window); everything before the one window shuffle
    pipelines into the scan. Counts are exact BIGINTs throughout."""
    docs = io.load_table(spark, sf_dir, "documents")
    words = _clean_words()

    tokenized = (
        docs.select("doc_id", words.alias("w"))
        .filter(F.size("w") >= 5)
        .select(
            "doc_id",
            (
                F.aggregate(
                    F.transform(F.col("w"), _word_tokens),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
                + _TP_SPECIAL
            ).alias("n_tokens"),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        tokenized.select(
            "doc_id", (F.col("doc_id") % _TP_SHARDS).alias("shard"), "n_tokens"
        )
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.floor(cum_excl.cast("double") / float(_TP_CTX))
            .cast("bigint")
            .alias("pack_id"),
            (cum_excl % _TP_CTX).cast("bigint").alias("pack_offset"),
        )
    )


# --------------------------------------------------------------------------
# corpus_build_e2e
# --------------------------------------------------------------------------

_E2E_MIN_WORDS = 5
_E2E_SHARDS = 4
_E2E_CTX = 512
_E2E_VAL_PCT = 10  # doc-hash % 100 < 10 -> validation split


@query(
    "corpus_build_e2e",
    oracle=f"""
    WITH cleaned AS (
        SELECT doc_id, text,
               list_filter(
                   string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                   x -> x <> ''
               ) AS words
        FROM documents
    ),
    admitted AS (
        SELECT * FROM cleaned WHERE len(words) >= {_E2E_MIN_WORDS}
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY md5(text) ORDER BY doc_id
            ) AS rn_exact
            FROM admitted
        ) WHERE rn_exact = 1
    ),
    head_deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY md5(substring(text, 1, 32)) ORDER BY doc_id
            ) AS rn_head
            FROM deduped
        ) WHERE rn_head = 1
    ),
    tokenized AS (
        SELECT doc_id,
               CASE WHEN CAST(('0x' || substring(md5('split:' ||
                        CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                        < {_E2E_VAL_PCT}
                    THEN 'val' ELSE 'train' END AS split,
               doc_id % {_E2E_SHARDS} AS shard,
               CAST(coalesce(list_sum(list_transform(
                   words, x -> {_bpe_sql_word_expr('x')}
               )), 0) + 2 AS BIGINT) AS n_tokens,
               -- fingerprints bounded mod 2^40 so the additive checksum
               -- stays in BIGINT under any corpus size seen here (DuckDB
               -- would silently widen to HUGEINT; Spark ANSI overflows)
               CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
                   % 1099511627776 AS doc_fp
        FROM head_deduped
    )
    SELECT split, CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_tokens) + {_E2E_CTX - 1}) // {_E2E_CTX} AS BIGINT)
               AS n_packs,
           CAST(sum(doc_fp) AS BIGINT) AS content_checksum
    FROM tokenized
    GROUP BY split, shard
    """,
)
def corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE corpus build, end to end in ONE plan: admission filter (>= 5
    clean words) -> exact dedup (md5 text, first wins) -> boilerplate
    head dedup (md5 of the first 32 chars — the cheap stand-in for the
    minhash path, which exists as its own keys) -> salted-hash
    train/val split -> real BPE token counts (+BOS/EOS) -> per-shard
    delivery stats: docs, tokens, 512-token pack count, and an
    order-insensitive additive content checksum. This is the manifest a
    training job consumes, with every number exact-BIGINT.

    Shape at scale: the filter and tokenizer are narrow codegen stages
    pipelined into the scan; the two dedups are keyed first-win windows
    (WindowGroupLimit); split/shard assignment is hash arithmetic; the
    final rollup is one map-side-combined aggregate over |splits| x
    |shards| groups. No collect, nothing global, no non-keyed window."""
    docs = io.load_table(spark, sf_dir, "documents")
    words = _clean_words()
    admitted = docs.select("doc_id", "text", words.alias("w")).filter(
        F.size("w") >= _E2E_MIN_WORDS
    )
    w_exact = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        admitted.withColumn("rn_exact", F.row_number().over(w_exact))
        .filter(F.col("rn_exact") == 1)
    )
    w_head = Window.partitionBy(
        F.md5(F.substring("text", 1, 32))
    ).orderBy("doc_id")
    head_deduped = (
        deduped.withColumn("rn_head", F.row_number().over(w_head))
        .filter(F.col("rn_head") == 1)
    )
    split_hash = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    doc_fp = (
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
        % 1099511627776
    )
    tokenized = head_deduped.select(
        F.when(split_hash < _E2E_VAL_PCT, "val").otherwise("train").alias(
            "split"
        ),
        (F.col("doc_id") % _E2E_SHARDS).alias("shard"),
        (
            F.aggregate(
                F.transform(F.col("w"), _word_tokens),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
            + 2
        ).alias("n_tokens"),
        doc_fp.alias("doc_fp"),
    )
    return tokenized.groupBy("split", F.col("shard").cast("bigint").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.floor(
            (F.sum("n_tokens") + (_E2E_CTX - 1)) / float(_E2E_CTX)
        ).cast("bigint").alias("n_packs"),
        F.sum("doc_fp").cast("bigint").alias("content_checksum"),
    )
