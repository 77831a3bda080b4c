"""Boundary gates for the compaction sink's exact-file-count contract
(queries/analytics_round2.py::sink_compact, ADVICE r10 low).

The oracle pins n_files = LEAST(count, 4) on the claim that
repartitionByRange(4, <unique key>) never leaves an interior partition
empty. This file probes EVERY small boundary count (1..8) plus a large
one, so a RangePartitioner sampling change surfaces as a named test
failure instead of a driver hash mystery."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 8, 100])
def test_compact_file_count_boundaries(spark, n):
    df = spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") * 3 + 1).alias("o_totalprice"),
    )
    d = tempfile.mkdtemp(prefix="hh_compact_probe_")
    try:
        df.repartitionByRange(4, "o_orderkey").write.mode(
            "overwrite"
        ).parquet(d)
        got = (
            spark.read.parquet(d)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert got == min(n, 4)
    finally:
        shutil.rmtree(d, ignore_errors=True)
