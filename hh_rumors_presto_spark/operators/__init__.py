"""Composed operators the engine exposes beyond single expressions.

Everything here is a composition of built-in DataFrame ops (SURVEY.md §4.2:
nothing needs a custom Catalyst rule). Order-dependent reference semantics
(first-wins dedup, forward-fill, offset windows) are made deterministic with
explicit position columns and total orders — never bare ``dropDuplicates``
where the survivor matters.
"""

from hh_rumors_presto_spark.operators.dedup import dedup_first_wins, exact_dedup
from hh_rumors_presto_spark.operators.windows import forward_fill, per_group_top_k
from hh_rumors_presto_spark.operators.asof import asof_join
from hh_rumors_presto_spark.operators.skyline import skyline_2d

__all__ = [
    "asof_join",
    "dedup_first_wins",
    "exact_dedup",
    "forward_fill",
    "per_group_top_k",
    "skyline_2d",
]
