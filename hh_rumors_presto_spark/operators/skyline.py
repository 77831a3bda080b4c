"""2-D Pareto skyline operator (maximize one metric, minimize the other),
optionally partitioned.

A row survives iff no other row in its partition is >= on the maximize
axis, <= on the minimize axis, and strictly better on at least one. Rows
tied on BOTH metrics all survive (dominance requires a strict edge).

Scale shape (the reason this is not a self-join): corpus-scale work is a
single keyed ``groupBy(part, max_col)`` that keeps the best (smallest)
minimize-value per level; the dominance scan then runs over DISTINCT
maximize-levels only — a window whose partition size is bounded by the
metric's cardinality, not the corpus — and survivors broadcast back. For
unbounded/continuous metrics, bucket the maximize axis first (the scan is
then over buckets; exactness is restored by a per-bucket refinement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    part_cols: list[str],
    max_col: str,
    min_col: str,
) -> DataFrame:
    """All non-dominated rows of ``df`` per ``part_cols`` group, where
    ``max_col`` is maximized and ``min_col`` minimized. Returns the input
    columns unchanged (survivors only)."""
    g = df.groupBy(*part_cols, max_col).agg(F.min(min_col).alias("__gmin"))
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = (
        g.withColumn("__runmin", F.min("__gmin").over(w))
        .filter(
            F.col("__runmin").isNull()
            | (F.col("__gmin") < F.col("__runmin"))
        )
        .select(*part_cols, max_col, "__gmin")
    )
    return (
        df.join(F.broadcast(keep), [*part_cols, max_col])
        .filter(F.col(min_col) == F.col("__gmin"))
        .drop("__gmin")
    )
