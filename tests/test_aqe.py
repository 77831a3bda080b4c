"""AQE runtime re-planning: the adaptive behaviors the session enables
(coalescePartitions, runtime broadcast conversion) actually fire."""

from __future__ import annotations

from pyspark.sql import functions as F

from hh_rumors_presto_spark import io


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    li = io.load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    agg.collect()  # materialize so AQE finalizes the plan
    plan = _executed_plan(agg)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:2000]


def test_aqe_runtime_broadcast_conversion(spark, sf_dir):
    """A join planned as SMJ (no hint, stats unknown after a filter) is
    converted to broadcast at runtime once AQE sees the actual small size."""
    li = io.load_table(spark, sf_dir, "lineitem")
    # small filtered side without an explicit broadcast hint
    small = (
        io.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    joined = li.join(small, li.l_orderkey == small.o_orderkey).select(
        "l_orderkey", "l_quantity"
    )
    joined.collect()
    plan = _executed_plan(joined)
    assert "BroadcastHashJoin" in plan, plan[:2000]
