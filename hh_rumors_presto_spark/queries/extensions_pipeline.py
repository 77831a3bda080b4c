"""Training-data pipeline compositions (BASELINE.json mandate, the
end-to-end shapes a 100 TB corpus build actually runs):

- deterministic hash sampling (reproducible splits without .sample()'s
  partitioning-dependent RNG),
- sliding-window document chunking (the tokenize-and-chunk step before
  training),
- the composed pretraining pipeline: quality gate -> exact dedup ->
  language stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

CHUNK = 16
STRIDE = 8


@query(
    "sample_hash",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash: unlike df.sample(seed), the
    selected set is a pure function of the key — stable across partitioning,
    engines, and reruns, which is what reproducible corpus splits need."""
    docs = io.load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return docs.filter(h % 10 == 0).select("doc_id", "lang")


@query(
    "text_chunk",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           CAST((start - 1) // {STRIDE} AS INT) AS chunk_no,
           array_to_string(toks[start : least(start + {CHUNK} - 1, n)], ' ') AS chunk_text,
           least(start + {CHUNK} - 1, n) - start + 1 AS n_chunk_tokens
    FROM (SELECT doc_id, toks, n, unnest(generate_series(1, n, {STRIDE})) AS start FROM t)
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: {CHUNK}-token chunks with stride {STRIDE}
    per document — pure array ops (sequence + explode + slice), fully
    distributed, no UDF."""
    docs = io.load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    toks = F.split("text", " ")
    t = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    exploded = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK)
    n_chunk = F.least(F.col("start") + CHUNK - 1, F.col("n")) - F.col("start") + 1
    return exploded.select(
        "doc_id",
        (((F.col("start") - 1) / STRIDE).cast("int")).alias("chunk_no"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        n_chunk.alias("n_chunk_tokens"),
    )


@query(
    "pipeline_pretrain",
    oracle="""
    WITH gated AS (
        SELECT *, string_split(text, ' ') AS toks
        FROM documents
        WHERE len(string_split(text, ' ')) >= 10
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) > 0.3
    ),
    deduped AS (
        SELECT md5(text) AS fp, min(doc_id) AS doc_id,
               min(lang) AS lang, min(len(toks)) AS n_tokens
        FROM gated
        GROUP BY md5(text)
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
    FROM deduped
    GROUP BY lang
    """,
)
def pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus build: quality gate (length + uniqueness ratio)
    -> exact dedup on content hash -> per-language corpus stats. One plan,
    two shuffles (dedup key, language) — the minimal shuffle count for
    these semantics."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_toks
    gated = docs.filter((n_toks >= 10) & (uniq_ratio > 0.3)).select(
        "doc_id", "lang", "text", n_toks.alias("n_tokens")
    )
    deduped = gated.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
    )


@query(
    "pipeline_eval_split",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_toks,
               CASE WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                    WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
    FROM tagged GROUP BY split
    """,
)
def pipeline_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by content-free key
    hash — the reproducible way to partition a corpus: the assignment is
    a pure function of the document id (salted so it is independent of
    every other hash-derived decision in the pipeline), so reruns,
    engines, and incremental additions all agree, and a document can
    never migrate between splits as the corpus grows. Emits the per-split
    document and token budget a training run is provisioned from.

    Scale: one narrow map + 3-group aggregate; no shuffle of the corpus
    beyond the map-side partial counts."""
    docs = io.load_table(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_toks"),
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
