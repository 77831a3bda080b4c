"""Constraint inference over tables — the catalog/metadata surface
(COVERAGE.md tier-3 item 6, started round 10).

Two primitives a warehouse catalog derives from data, not DDL:

- ``candidate_keys``: columns whose exact distinct count equals the
  row count — uniqueness holds, the column can serve as a key. One
  aggregate pass; Spark plans multiple COUNT(DISTINCT) via a single
  Expand + two-phase aggregation (map-side partials per distinct
  branch — linear, no joins). At fleet scale the cheap screen is
  approx_count_distinct first, then one exact pass over the few
  survivors; the exact form here IS that verification pass.
- ``fk_containment``: the child column's value set must be contained
  in the parent's key set — verified with a LEFT ANTI join (broadcast
  when the parent is dimension-sized, shuffle hash otherwise; both
  sides key-pruned to single columns). Returns the violation count
  and sample, so a broken FK is actionable, not just boolean.

Reference behavior generalized: the reference trusts its feed's
implicit keys (fetchRumors.js dedups on the url slug); these
operators make such assumptions checkable on 100 TB of parquet.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candidate_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per probed column: (column, n_rows, n_distinct,
    is_candidate_key). Exact distinct counts, single aggregate pass."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
        # count(*) - count(c), not sum(when(...)): sum over zero rows
        # is NULL, which would poison n_null/is_candidate_key on an
        # empty relation, where the vacuous answer is 0/TRUE
        aggs.append(
            (F.count("*") - F.count(F.col(c))).alias(f"__null_{c}")
        )
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(
            row.select(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__d_{c}").cast("long").alias("n_distinct"),
                F.col(f"__null_{c}").cast("long").alias("n_null"),
                (
                    (F.col(f"__d_{c}") == F.col("__n"))
                    & (F.col(f"__null_{c}") == 0)
                ).alias("is_candidate_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def fk_containment(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
    sample: int = 5,
) -> dict:
    """Check child.child_col ⊆ parent.parent_col. Returns
    {holds, n_violations, sample_violations}. NULL child values are
    ignored (SQL FK semantics: NULL references nothing)."""
    keys = parent.select(F.col(parent_col).alias("__pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    viol = (
        child.select(F.col(child_col).alias("__ck"))
        .filter(F.col("__ck").isNotNull())
        .join(keys, F.col("__ck") == F.col("__pk"), "left_anti")
    )
    n = viol.count()
    samp = (
        [r["__ck"] for r in viol.limit(sample).collect()] if n else []
    )
    return {"holds": n == 0, "n_violations": n, "sample_violations": samp}
