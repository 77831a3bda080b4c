"""Round-65 breadth batch: generation-diversity metrics, self-BLEU,
and the corpus dedup-rate dashboard.

- ``eval_distinct_n`` — Distinct-1/2/3 (Li et al. 2016): unique
  n-grams over total n-grams across the corpus — THE generation-
  diversity metric; a model collapsing to repetitive text shows up
  here before a human reads a single sample.
- ``eval_self_bleu_lite`` — self-BLEU's core signal as exact
  integers: for each document, the share of its bigrams that occur
  in OTHER documents — high self-overlap means the corpus (or the
  model that generated it) says the same things everywhere;
  complementary to Distinct-n, which ignores who repeats whom.
- ``corpus_dedup_rate_dashboard`` — the one-row dedup dashboard:
  exact-duplicate rate at document, paragraph-fingerprint, and
  5-gram grain side by side — the three numbers every corpus
  report leads with, and the before/after deltas every dedup PR
  must show.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# eval_distinct_n
# --------------------------------------------------------------------------


@query(
    "eval_distinct_n",
    oracle="""
    WITH tok AS (
        SELECT doc_id, t, row_number() OVER (
                   PARTITION BY doc_id ORDER BY pos) AS idx
        FROM (
            SELECT doc_id, u.t, u.pos
            FROM documents,
                 LATERAL (SELECT unnest(string_split(text, ' ')) AS t,
                          generate_subscripts(
                              string_split(text, ' '), 1) AS pos) u
        )
    ),
    uni AS (
        SELECT count(*) AS total, count(DISTINCT t) AS uniq FROM tok
    ),
    bi AS (
        SELECT count(*) AS total,
               count(DISTINCT (a.t || ' ' || b.t)) AS uniq
        FROM tok a JOIN tok b
          ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
    ),
    tri AS (
        SELECT count(*) AS total,
               count(DISTINCT (a.t || ' ' || b.t || ' ' || c.t))
                   AS uniq
        FROM tok a
        JOIN tok b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
        JOIN tok c ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
    )
    SELECT n, CAST(total AS BIGINT) AS total_ngrams,
           CAST(uniq AS BIGINT) AS unique_ngrams,
           (2000000 * uniq + total) // (2 * total)
               AS distinct_micro
    FROM (
        SELECT CAST(1 AS BIGINT) AS n, total, uniq FROM uni
        UNION ALL SELECT 2, total, uniq FROM bi
        UNION ALL SELECT 3, total, uniq FROM tri
    )
    """,
)
def eval_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/2/3 over the corpus: unique n-grams over total
    n-grams for n = 1, 2, 3 in exact integral micro units — the
    generation-diversity triplet (Li et al. 2016). A fine-tuned
    model sliding into repetition drops Distinct-2/3 long before
    perplexity moves, which is why every generation eval table
    carries these columns; on a crawl, a falling Distinct-3 between
    snapshots means boilerplate is taking over.

    Scale: n-grams form per document via keyed adjacent-position
    equi-joins (Σ doc_len bounded); each level is one distinct-count
    fold with map-side partials."""
    tok = io.load_table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("idx", "t")
    )
    b = tok.select(
        F.col("doc_id").alias("bd"),
        F.col("idx").alias("bi"),
        F.col("t").alias("bt"),
    )
    c = tok.select(
        F.col("doc_id").alias("cd"),
        F.col("idx").alias("ci"),
        F.col("t").alias("ct"),
    )
    uni = tok.agg(
        F.lit(1).cast("long").alias("n"),
        F.count("*").alias("total"),
        F.countDistinct("t").alias("uniq"),
    )
    bi_df = (
        tok.join(
            b,
            (F.col("doc_id") == F.col("bd"))
            & (F.col("bi") == F.col("idx") + 1),
        )
        .select(F.concat_ws(" ", "t", "bt").alias("g"))
        .agg(
            F.lit(2).cast("long").alias("n"),
            F.count("*").alias("total"),
            F.countDistinct("g").alias("uniq"),
        )
    )
    tri_df = (
        tok.join(
            b,
            (F.col("doc_id") == F.col("bd"))
            & (F.col("bi") == F.col("idx") + 1),
        )
        .join(
            c,
            (F.col("doc_id") == F.col("cd"))
            & (F.col("ci") == F.col("idx") + 2),
        )
        .select(F.concat_ws(" ", "t", "bt", "ct").alias("g"))
        .agg(
            F.lit(3).cast("long").alias("n"),
            F.count("*").alias("total"),
            F.countDistinct("g").alias("uniq"),
        )
    )
    return (
        uni.unionAll(bi_df)
        .unionAll(tri_df)
        .select(
            "n",
            F.col("total").cast("long").alias("total_ngrams"),
            F.col("uniq").cast("long").alias("unique_ngrams"),
            # nullif: an empty corpus has total=0 and DuckDB's `// 0` is
            # NULL while Spark's `div 0` raises under ANSI (r9 sf0 audit)
            F.expr(
                "(2000000 * uniq + total) div (2 * nullif(total, 0))"
            ).alias("distinct_micro"),
        )
    )


# --------------------------------------------------------------------------
# eval_self_bleu_lite
# --------------------------------------------------------------------------


@query(
    "eval_self_bleu_lite",
    oracle="""
    WITH tok AS (
        SELECT doc_id, t, row_number() OVER (
                   PARTITION BY doc_id ORDER BY pos) AS idx
        FROM (
            SELECT doc_id, u.t, u.pos
            FROM documents,
                 LATERAL (SELECT unnest(string_split(text, ' ')) AS t,
                          generate_subscripts(
                              string_split(text, ' '), 1) AS pos) u
        )
    ),
    bg AS (
        SELECT DISTINCT a.doc_id, a.t || ' ' || b.t AS g
        FROM tok a JOIN tok b
          ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
    ),
    gdocs AS (SELECT g, count(*) AS ndocs FROM bg GROUP BY g),
    per_doc AS (
        SELECT bg.doc_id, count(*) AS n_grams,
               sum(CASE WHEN gd.ndocs > 1 THEN 1 ELSE 0 END)
                   AS n_shared
        FROM bg JOIN gdocs gd ON gd.g = bg.g
        GROUP BY bg.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_distinct_bigrams,
           CAST(sum(n_shared) AS BIGINT) AS shared_bigrams,
           CAST((2000000 * sum(n_shared) + sum(n_grams))
               // (2 * sum(n_grams)) AS BIGINT) AS self_overlap_micro
    FROM per_doc
    """,
)
def eval_self_bleu_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU's core signal, made exact: for each document, the
    share of its DISTINCT bigrams that also occur in at least one
    OTHER document, pooled into the corpus self-overlap rate
    (integral micro units). High self-overlap with healthy
    Distinct-n means the same phrases circulate between documents —
    mode collapse in a generator, template farms in a crawl —
    precisely the case Distinct-n alone cannot see because the
    corpus-wide n-gram pool still looks diverse.

    Scale: per-doc distinct bigrams via keyed position joins; the
    cross-doc sharing test is ONE document-frequency fold joined
    back (broadcast at this scale, co-partitioned at web scale) —
    never a doc-pair join, which is what makes this 'lite' tractable
    where true pairwise self-BLEU is O(n²)."""
    tok = io.load_table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("idx", "t")
    )
    b = tok.select(
        F.col("doc_id").alias("bd"),
        F.col("idx").alias("bi"),
        F.col("t").alias("bt"),
    )
    bg = (
        tok.join(
            b,
            (F.col("doc_id") == F.col("bd"))
            & (F.col("bi") == F.col("idx") + 1),
        )
        .select("doc_id", F.concat_ws(" ", "t", "bt").alias("g"))
        .distinct()
    )
    gdocs = bg.groupBy("g").agg(F.count("*").alias("ndocs"))
    per_doc = (
        bg.join(F.broadcast(gdocs), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("ndocs") > 1, 1).otherwise(0)
            ).alias("n_shared"),
        )
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_grams").cast("long").alias("total_distinct_bigrams"),
        F.sum("n_shared").cast("long").alias("shared_bigrams"),
        F.expr(
            "(2000000 * sum(n_shared) + sum(n_grams))"
            " div (2 * sum(n_grams))"
        ).alias("self_overlap_micro"),
    )


# --------------------------------------------------------------------------
# corpus_dedup_rate_dashboard
# --------------------------------------------------------------------------


@query(
    "corpus_dedup_rate_dashboard",
    oracle="""
    WITH doc_dup AS (
        SELECT count(*) AS total,
               count(*) - count(DISTINCT md5(text)) AS dups
        FROM documents
    ),
    para AS (
        SELECT md5(trim(p)) AS fp
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, '. '))
                          AS p) u
        WHERE trim(p) <> ''
    ),
    para_dup AS (
        SELECT count(*) AS total,
               count(*) - count(DISTINCT fp) AS dups
        FROM para
    ),
    grams AS (
        SELECT md5(a.t || ' ' || b.t || ' ' || c.t || ' '
                   || d.t || ' ' || e.t) AS g
        FROM (
            SELECT doc_id, t, row_number() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS idx
            FROM (
                SELECT doc_id, u.t, u.pos
                FROM documents,
                     LATERAL (SELECT unnest(string_split(text, ' '))
                                  AS t,
                              generate_subscripts(
                                  string_split(text, ' '), 1)
                                  AS pos) u
            )
        ) a
        JOIN (SELECT doc_id, t, row_number() OVER (
                  PARTITION BY doc_id ORDER BY pos) AS idx
              FROM (SELECT doc_id, u.t, u.pos FROM documents,
                    LATERAL (SELECT unnest(string_split(text, ' '))
                                 AS t,
                             generate_subscripts(
                                 string_split(text, ' '), 1)
                                 AS pos) u)) b
          ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
        JOIN (SELECT doc_id, t, row_number() OVER (
                  PARTITION BY doc_id ORDER BY pos) AS idx
              FROM (SELECT doc_id, u.t, u.pos FROM documents,
                    LATERAL (SELECT unnest(string_split(text, ' '))
                                 AS t,
                             generate_subscripts(
                                 string_split(text, ' '), 1)
                                 AS pos) u)) c
          ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
        JOIN (SELECT doc_id, t, row_number() OVER (
                  PARTITION BY doc_id ORDER BY pos) AS idx
              FROM (SELECT doc_id, u.t, u.pos FROM documents,
                    LATERAL (SELECT unnest(string_split(text, ' '))
                                 AS t,
                             generate_subscripts(
                                 string_split(text, ' '), 1)
                                 AS pos) u)) d
          ON d.doc_id = a.doc_id AND d.idx = a.idx + 3
        JOIN (SELECT doc_id, t, row_number() OVER (
                  PARTITION BY doc_id ORDER BY pos) AS idx
              FROM (SELECT doc_id, u.t, u.pos FROM documents,
                    LATERAL (SELECT unnest(string_split(text, ' '))
                                 AS t,
                             generate_subscripts(
                                 string_split(text, ' '), 1)
                                 AS pos) u)) e
          ON e.doc_id = a.doc_id AND e.idx = a.idx + 4
    ),
    gram_dup AS (
        SELECT count(*) AS total,
               count(*) - count(DISTINCT g) AS dups
        FROM grams
    )
    SELECT grain, CAST(total AS BIGINT) AS total,
           CAST(dups AS BIGINT) AS duplicates,
           (2000000 * dups + total) // (2 * total) AS dup_micro
    FROM (
        SELECT 'document' AS grain, total, dups FROM doc_dup
        UNION ALL SELECT 'sentence', total, dups FROM para_dup
        UNION ALL SELECT '5gram', total, dups FROM gram_dup
    )
    """,
)
def corpus_dedup_rate_dashboard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup dashboard: exact duplicate rates at three grains in
    one result — whole documents (md5 of text), sentences (split on
    '. ', trimmed), and 5-gram occurrences — each as duplicates over
    total in integral micro units. These are the three numbers a
    corpus report leads with because they answer different
    questions: document dups are crawl-infrastructure failures,
    sentence dups are boilerplate, n-gram dup mass is what the
    model will actually memorize. Every dedup PR shows this row
    before and after.

    Scale: three independent fingerprint folds, all map-side
    combined distinct counts; the n-gram grain reuses the keyed
    position joins (Σ doc_len bounded)."""
    docs = io.load_table(spark, sf_dir, "documents")
    doc_dup = docs.agg(
        F.lit("document").alias("grain"),
        F.count("*").alias("total"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("dups"),
    )
    para = (
        docs.select(
            F.explode(F.split("text", "\\. ")).alias("p")
        )
        .select(F.trim("p").alias("p"))
        .filter(F.col("p") != "")
        .select(F.md5("p").alias("fp"))
    )
    para_dup = para.agg(
        F.lit("sentence").alias("grain"),
        F.count("*").alias("total"),
        (F.count("*") - F.countDistinct("fp")).alias("dups"),
    )
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("idx", "t")
    )
    joined = tok.alias("a")
    for i, al in enumerate(("b", "c", "d", "e"), start=1):
        joined = joined.join(
            tok.select(
                F.col("doc_id").alias(f"{al}_d"),
                F.col("idx").alias(f"{al}_i"),
                F.col("t").alias(f"{al}_t"),
            ),
            (F.col("a.doc_id") == F.col(f"{al}_d"))
            & (F.col(f"{al}_i") == F.col("a.idx") + i),
        )
    grams = joined.select(
        F.md5(
            F.concat_ws(
                " ",
                F.col("a.t"),
                F.col("b_t"),
                F.col("c_t"),
                F.col("d_t"),
                F.col("e_t"),
            )
        ).alias("g")
    )
    gram_dup = grams.agg(
        F.lit("5gram").alias("grain"),
        F.count("*").alias("total"),
        (F.count("*") - F.countDistinct("g")).alias("dups"),
    )
    return (
        doc_dup.unionAll(para_dup)
        .unionAll(gram_dup)
        .select(
            "grain",
            F.col("total").cast("long").alias("total"),
            F.col("dups").cast("long").alias("duplicates"),
            # nullif on the empty-corpus total (r9 sf0 audit; see
            # eval_distinct_n above)
            F.expr(
                "(2000000 * dups + total) div (2 * nullif(total, 0))"
            ).alias("dup_micro"),
        )
    )
