"""Unit tests for text-analysis branches the synthetic fixtures never take
(CJK language-ID) and for chunking arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_langid_cjk_branch(spark):
    """The zh codepoint-range branch fires on real CJK text."""
    df = spark.createDataFrame(
        [("汉字 text here",), ("der und das nicht x",), ("plain words",)],
        ["text"],
    )
    detected = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .otherwise("other")
    )
    out = [r[0] for r in df.select(detected).collect()]
    assert out == ["zh", "other", "other"]


def test_chunking_shape(spark):
    """16-token chunks, stride 8: a 20-token doc yields starts 1,9,17 with
    lengths 16,12,4."""
    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    toks = F.split("text", " ")
    t = df.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    exploded = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(8))).alias("start"),
        "toks",
        "n",
    )
    out = exploded.select(
        "start",
        F.size(F.slice("toks", F.col("start"), 16)).alias("len"),
    ).collect()
    assert sorted((r["start"], r["len"]) for r in out) == [
        (1, 16),
        (9, 12),
        (17, 4),
    ]
