"""Deduplication operators.

``dedup_first_wins`` generalizes the reference's Set-based first-occurrence
dedup (fetchRumors.js:128,141-148 per-tag; 189-196 global): the survivor of
each key group is the FIRST row under an explicit total order — expressed as
``row_number() = 1`` over a window, never bare ``dropDuplicates`` (whose
survivor is nondeterministic; SURVEY.md §7.4 item 1).

Scale note: row_number-over-window shuffles once on the key, identical cost
shape to groupBy; with AQE skew handling a hot key splits at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_wins(
    df: DataFrame,
    key: Column | Sequence[Column],
    order: Sequence[Column],
    keep_rank_col: bool = False,
) -> DataFrame:
    """Keep the first row per ``key`` under the total order ``order``.

    ``order`` MUST be a total order (include a unique tiebreaker column) or
    the survivor is undefined — same trap as the reference's never-returns-0
    sort comparator (fetchRumors.js:187).
    """
    keys = [key] if isinstance(key, Column) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out if keep_rank_col else out.drop("__rn")


def exact_dedup(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact dedup where ANY row per key is acceptable -> hash-groupBy.

    Spark plans this as partial+final hash aggregate (map-side combine), so
    at 100 TB the shuffle carries one row per key per input partition, not
    the full table.
    """
    return df.dropDuplicates(list(cols))
