"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` per key.

Spark has no native ASOF JOIN. r11 OPTIMIZATION (guide §2.3 "shuffle fewer
bytes" / §3.3 "explode before a join multiplies the shuffle"): the previous
shape was an equi-join on the key whose intermediate fans out to
|left_k| x |right_k| rows per key before a max_by re-aggregation collapses
it. This version is the classic MERGE-AS-OF: union the two sides tagged,
one keyed shuffle of |left| + |right| THIN rows, sort within the key by
(ts, side, tiebreak), and carry the latest right payload forward with a
running ``last(ignorenulls)`` window — the pair fan-out never exists.
Semantics are unchanged (verified row-identical against the old plan and
by the brute-force property test):

- right rows sort BEFORE left rows at equal ts (side tag), so
  ``right.ts <= left.ts`` inclusivity is preserved;
- among right rows tied on ts, the ascending unique ``right_tiebreak``
  makes ``last`` pick the max tiebreak — exactly ``max_by((ts, tb))``;
- payload columns ride ONE struct, so a matched row whose payload field
  is legitimately NULL stays NULL (per-column last(ignorenulls) would
  resurrect an older row's value);
- right rows with NULL key or NULL ts can never satisfy the old join
  condition and are filtered; left rows with NULL key/ts keep NULL
  payloads (left-outer semantics, like DuckDB ASOF LEFT JOIN).

At 100 TB the window is keyed by the join key — the same grain the old
equi-join shuffled on — with per-key cost linear instead of quadratic;
for dense right sides a ts-bucketed pre-aggregation can still cap
per-key row counts, but no caller needs it at current fan-outs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Latest-right-at-or-before-left per key. Left rows with no match keep
    nulls (left outer semantics, like DuckDB ASOF LEFT JOIN).

    ``right_tiebreak`` names a unique right column that breaks timestamp
    ties deterministically (a bare ts is nondeterministic when two right
    rows collapse to the same microsecond).

    (r12, ADVICE: the merge form keeps each left row's identity
    positionally — no re-aggregation — so the old ``left_id`` parameter
    was a silent no-op and is removed rather than left to drift.)
    """
    ts, side, tb, pay = "__asof_ts", "__asof_side", "__asof_tb", "__asof_pay"
    clash = {ts, side, tb, pay}.intersection(left.columns)
    if clash:
        raise ValueError(f"asof_join reserved column collision: {sorted(clash)}")
    tb_col = F.col(right_tiebreak) if right_tiebreak else F.lit(None)
    r = (
        right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias(ts),
            F.lit(0).alias(side),
            tb_col.alias(tb),
            F.struct(*[F.col(c) for c in payload_cols]).alias(pay),
        )
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(side).asc(), F.col(tb).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(pay, F.last(pay, ignorenulls=True).over(w))
    return matched.filter(F.col(side) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{pay}.{c}").alias(c) for c in payload_cols],
    )
