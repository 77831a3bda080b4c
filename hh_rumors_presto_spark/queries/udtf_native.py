"""Native Python UDTF (Spark 4 ``@udtf``) — the remaining piece of the UDF
surface (SURVEY.md §2.B row "UDTF"): a real table function class, not an
explode composition, generalizing the reference's one-page -> many-items
extractor (parseTagPage, fetchRumors.js:75-124). Plus explode_outer's
row-preserving semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@udtf(returnType="pos int, trigram string")
class TokenTrigrams:
    """One input text -> one row per token trigram (deterministic, pure)."""

    def eval(self, text: str):  # noqa: D102
        toks = (text or "").split(" ")
        for i in range(len(toks) - 2):
            yield i + 1, " ".join(toks[i : i + 3])


@query(
    "udtf_native",
    oracle="""
    SELECT doc_id,
           generate_subscripts(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                    || ' ' || string_split(text,' ')[i+2]), 1) AS pos,
           unnest(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                    || ' ' || string_split(text,' ')[i+2])) AS trigram
    FROM documents
    WHERE doc_id % 50 = 0
    """,
)
def udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF via lateral join: each document row fans out to
    its token trigrams inside the UDTF class (Arrow-batched; the UDTF
    mechanism is what a real parseTagPage port would use — HTML in, item
    rows out)."""
    docs = io.load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("token_trigrams", TokenTrigrams)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.trigram
        FROM udtf_docs d, LATERAL token_trigrams(d.text) t
        """
    )


@query(
    "explode_outer_preserve",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN []::VARCHAR[]
                    ELSE string_split(text, ' ')[1:3] END AS toks
        FROM documents WHERE doc_id % 25 = 0
    )
    SELECT t.doc_id, u.tok
    FROM t LEFT JOIN (SELECT doc_id, unnest(toks) AS tok FROM t) u
      ON u.doc_id = t.doc_id
    """,
)
def explode_outer_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with a null element
    (plain explode would drop them) — the null-preserving UDTF shape."""
    docs = io.load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    )
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.explode_outer("toks").alias("tok")
    )
