"""Window-function operators: forward-fill and per-group top-k."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    out_col: str | None = None,
) -> DataFrame:
    """LOCF forward-fill: classic last-non-null over an unbounded-preceding
    rows frame. Generalizes the reference's mutable ``currentDateISO``
    carried through the document-order loop (fetchRumors.js:87,96-100).
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col or col, F.last(col, ignorenulls=True).over(w))


def per_group_top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group (generalizes the per-page cap 80 / per-tag cap
    150, fetchRumors.js:119,148). ``order_by`` must be a total order.

    Planned as a single shuffle on the group key; Spark's WindowExec applies
    a per-partition sort — no global sort, no driver collect.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
