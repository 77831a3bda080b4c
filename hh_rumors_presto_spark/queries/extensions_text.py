"""Text analysis for training-data pipelines (BASELINE.json mandate):
language-ID heuristic, quality scoring, token counting, tf-idf terms,
document fingerprinting.

Parity discipline: every score is rational arithmetic (counts and exact
IEEE divisions/multiplications) — no ln/exp, whose libm implementations can
differ across engines in the last ulp. The tf-idf uses the rational idf
variant tf * (N+1)/(df+1) for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# BPE-ish word/punct tokenizer (ASCII-safe subset, same regex both engines).
_BPE_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

_STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "on", "for")


@query(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, uniques."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.length("text").alias("n_chars_actual"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text,
               string_split(text, ' ') AS toks,
               length(text) AS n_chars
        FROM documents
    )
    SELECT doc_id,
           n_chars,
           len(toks) AS n_tokens,
           CAST(n_chars AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(list_filter(toks, x -> list_contains({list(_STOPWORDS)!r}::VARCHAR[], x))) AS DOUBLE)
               / len(toks) AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS unique_ratio,
           CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
               / nullif(n_chars, 0) AS punct_ratio,
           len(toks) >= 10 AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.3
               AS passes_quality
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, avg token length, stopword/unique/punct
    ratios, and a pass/fail gate — the standard pre-training filter set."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_uniq = F.size(F.array_distinct(toks))
    n_punct = F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", ""))
    uniq_ratio = n_uniq.cast("double") / n_toks
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_toks.alias("n_tokens"),
        (F.length("text").cast("double") / n_toks).alias("avg_token_len"),
        (n_stop.cast("double") / n_toks).alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        (
            n_punct.cast("double") / F.nullif(F.length("text"), F.lit(0))
        ).alias("punct_ratio"),
        ((n_toks >= 10) & (uniq_ratio > 0.3)).alias("passes_quality"),
    )


# Signature words per language — a deterministic n-gram-style heuristic.
# The fixture text is synthetic, so this tests the *plumbing* (per-language
# scoring + argmax) with an exact oracle, not real-world accuracy.
_LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "los", "las", "que"),
    "fr": ("le", "les", "des", "est", "et"),
    "en": ("the", "of", "and", "is", "to"),
}


def _lang_score_sql(lang: str) -> str:
    words = list(_LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"x -> list_contains({words!r}::VARCHAR[], x)))"
    )


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN {_lang_score_sql("de")} > {_lang_score_sql("es")}
              AND {_lang_score_sql("de")} > {_lang_score_sql("fr")}
              AND {_lang_score_sql("de")} > {_lang_score_sql("en")} THEN 'de'
             WHEN {_lang_score_sql("es")} > {_lang_score_sql("fr")}
              AND {_lang_score_sql("es")} > {_lang_score_sql("en")} THEN 'es'
             WHEN {_lang_score_sql("fr")} > {_lang_score_sql("en")} THEN 'fr'
             ELSE 'en'
           END AS detected_lang
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: CJK codepoint check, then marker-word scores
    with a fixed precedence argmax. Deterministic rules -> exact oracle."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    detected = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(
            (score("de") > score("es"))
            & (score("de") > score("fr"))
            & (score("de") > score("en")),
            "de",
        )
        .when((score("es") > score("fr")) & (score("es") > score("en")), "es")
        .when(score("fr") > score("en"), "fr")
        .otherwise("en")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detected.alias("detected_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS exact_fp,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS bag_fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + order-insensitive
    bag-of-words hash (sorted distinct tokens) — the pair used to catch
    reordered near-copies cheaply."""
    docs = io.load_table(spark, sf_dir, "documents")
    bag = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split("text", " ")))
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("exact_fp"),
        F.md5(bag).alias("bag_fp"),
    )


@query(
    "text_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score
    FROM (
        SELECT doc_id, term, score,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
               ) AS rn
        FROM scored
    )
    WHERE rn <= 3 AND doc_id % 10 = 0
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf top-3 terms per doc (rational idf (N+1)/(df+1): exact
    cross-engine floats). df is a tiny aggregate -> broadcast back; the only
    big shuffle is the (doc, term) tf aggregation. The corpus size N rides
    in-plan as a broadcast one-row aggregate (dq_drift_psi pattern) instead
    of a driver-side .count() — the whole query is one job."""
    docs = io.load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * ((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") % 10 == 0))
        .select("doc_id", "term", "score")
    )


@query(
    "text_stem",
    oracle="""
    WITH stemmed AS (
        SELECT doc_id,
               list_transform(
                   string_split(text, ' '),
                   t -> CASE
                          WHEN length(t) > 5 AND t LIKE '%ing' THEN substring(t, 1, length(t) - 3)
                          WHEN length(t) > 4 AND t LIKE '%ed' THEN substring(t, 1, length(t) - 2)
                          WHEN length(t) > 3 AND t LIKE '%es' THEN substring(t, 1, length(t) - 2)
                          WHEN length(t) > 3 AND t LIKE '%s' AND t NOT LIKE '%ss'
                              THEN substring(t, 1, length(t) - 1)
                          ELSE t
                        END
               ) AS toks
        FROM documents
        WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           generate_subscripts(toks, 1) AS pos,
           unnest(toks) AS stem
    FROM stemmed
    """,
)
def text_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lightweight suffix-stripping stemmer (S-stemmer-style rules) as a
    pure array transform — the normalization step before token-level dedup
    or tf-idf; no UDF, fully codegen'd.

    Output is one (doc_id, pos, stem) row per token — array-typed result
    columns crash the driver canonicalizer (r1 err), so the stemmed array
    is posexploded (1-based pos to match SQL generate_subscripts)."""
    docs = io.load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    toks = F.split("text", " ")
    stemmed = F.transform(
        toks,
        lambda t: F.when(
            (F.length(t) > 5) & t.endswith("ing"),
            t.substr(F.lit(1), F.length(t) - 3),
        )
        .when(
            (F.length(t) > 4) & t.endswith("ed"),
            t.substr(F.lit(1), F.length(t) - 2),
        )
        .when(
            (F.length(t) > 3) & t.endswith("es"),
            t.substr(F.lit(1), F.length(t) - 2),
        )
        .when(
            (F.length(t) > 3) & t.endswith("s") & ~t.endswith("ss"),
            t.substr(F.lit(1), F.length(t) - 1),
        )
        .otherwise(t),
    )
    return (
        docs.select("doc_id", F.posexplode(stemmed).alias("pos", "stem"))
        .select("doc_id", (F.col("pos") + 1).alias("pos"), "stem")
    )


@query(
    "text_readability",
    oracle="""
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_syll AS BIGINT) AS n_syll,
           round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                         - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 4)
               AS flesch
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sents,
               greatest(len(string_split(text, ' ')),
                        len(regexp_extract_all(lower(text), '[aeiouy]+')))
                   AS n_syll
        FROM documents
    )
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease from deterministic proxies: sentences =
    terminal-punctuation runs (min 1), syllables = vowel-group runs
    (floored at one per word) — the classic readability gate in corpus
    quality mixes, kept exactly reproducible (regexp counts, no
    dictionary). Pure codegen column expressions, zero shuffle."""
    docs = io.load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    n_sents = F.greatest(
        F.lit(1), F.regexp_count("text", F.lit(r"[.!?]+"))
    )
    n_syll = F.greatest(
        n_words, F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+"))
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        n_syll.cast("long").alias("n_syll"),
        F.round(
            F.lit(206.835)
            - 1.015 * (n_words.cast("double") / n_sents)
            - 84.6 * (n_syll.cast("double") / n_words),
            4,
        ).alias("flesch"),
    )


@query(
    "text_code_detect",
    oracle="""
    SELECT doc_id,
           CAST(n_sym AS BIGINT) AS n_code_symbols,
           round(CAST(n_sym AS DOUBLE) / n_chars, 6) AS code_symbol_ratio,
           CAST(n_sym AS DOUBLE) / n_chars > 0.02 AS looks_like_code
    FROM (
        SELECT doc_id,
               len(regexp_extract_all(text, '[{}();=\\[\\]<>]')) AS n_sym,
               greatest(1, length(text)) AS n_chars
        FROM documents
    )
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing signal: density of code-punctuation
    characters ({};()=[]<>) per character — the cheap first-stage router
    that sends code to a code pipeline (different dedup/quality rules)
    and prose to the text one. Pure codegen regexp count, zero shuffle."""
    docs = io.load_table(spark, sf_dir, "documents")
    n_sym = F.regexp_count("text", F.lit(r"[{}();=\[\]<>]"))
    n_chars = F.greatest(F.lit(1), F.length("text"))
    ratio = n_sym.cast("double") / n_chars
    return docs.select(
        "doc_id",
        n_sym.cast("long").alias("n_code_symbols"),
        F.round(ratio, 6).alias("code_symbol_ratio"),
        (ratio > 0.02).alias("looks_like_code"),
    )


@query(
    "text_bpe_merges",
    oracle="""
    WITH chars AS (
        SELECT doc_id, regexp_extract_all(lower(substring(text, 1, 80)), '[a-z]') AS cs
        FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(cs) - 1),
                   i -> cs[i] || cs[i + 1]
               )) AS pair
        FROM chars WHERE len(cs) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 10
    """,
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, iteration one: the most frequent adjacent
    character pairs over the corpus — the merge-table construction step
    (rank 1 = the first merge a BPE trainer would learn). Letters-only
    over an 80-char prefix keeps the demo bounded; the full trainer is
    this aggregation iterated with the winning pair substituted. Shape:
    regexp char split (bound column) -> zip_with pair stream -> hash agg
    with map-side partials -> top-10 via TakeOrderedAndProject."""
    docs = io.load_table(spark, sf_dir, "documents")
    cs = F.col("cs")
    pairs = F.zip_with(
        F.slice(cs, 1, F.size(cs) - 1),
        F.slice(cs, 2, F.size(cs) - 1),
        lambda x, y: F.concat(x, y),
    )
    return (
        docs.select(
            F.regexp_extract_all(
                F.lower(F.substring("text", 1, 80)), F.lit("[a-z]"), 0
            ).alias("cs")
        )
        .filter(F.size(cs) >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(10)
    )


from hh_rumors_presto_spark.registry import ORACLES as _ORACLES  # noqa: E402


@query(
    "text_langid_accuracy",
    oracle=f"""
    WITH pred AS ({_ORACLES["text_langid"]})
    SELECT labeled_lang, detected_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM pred
    GROUP BY labeled_lang, detected_lang
    """,
)
def text_langid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language detector against the
    labeled ``lang`` column — the classifier-quality measurement, pinned
    as an oracle row set like the ANN/dedup recall keys: any change to
    the marker lists or precedence shifts a confusion cell and fails
    correctness. (Both sides reuse the text_langid definition verbatim —
    the measurement can never drift from the measured classifier.)

    Honest reading of the measured matrix: the fixtures' text is
    language-AGNOSTIC by construction (synthetic workload tokens,
    identical vocabulary for every lang label), so every document
    detects as 'en' and accuracy equals the majority-class share
    (218/500) — the matrix documents that the fixture carries zero
    language signal, which is itself worth pinning; on a natural corpus
    the same key measures real accuracy.

    Scale: one narrow map (the detector is pure column expressions) plus
    a 25-cell hash aggregate."""
    return (
        text_langid(spark, sf_dir)
        .groupBy("labeled_lang", "detected_lang")
        .agg(F.count("*").cast("long").alias("n"))
    )
