"""Paginated-source connector (SURVEY.md §4.2 item 2, generalizing the
reference's page crawl, fetchRumors.js:126-151).

The reference enumerates HTTP pages serially, parses each, applies a
per-page emit cap and a per-source total cap, and stops early on errors
keeping partial results. This connector keeps that driver-side enumeration
contract but lands each page as an Arrow batch into one DataFrame:

    fetch_page(page_no) -> pandas.DataFrame (empty = end of source)

Per-page failure policy mirrors the reference: stop the scan, keep what was
fetched (fetchRumors.js:133-138 break-on-error), never fail the job.

Scale note: a paged *external* source is inherently driver-sequenced (page N
tells you whether N+1 exists); the parallelism comes after landing — the
union'd DataFrame is partitioned and every downstream transformation is
distributed. For sources with known page counts, the enumeration itself can
fan out via spark.range(n_pages).mapInPandas(fetch).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_paged(
    spark: SparkSession,
    fetch_page: Callable[[int], pd.DataFrame],
    max_pages: int = 10,
    per_page_limit: int = 80,
    total_limit: int = 150,
    schema=None,
    start_page: int = 1,
) -> DataFrame:
    """Enumerate pages start_page..max_pages, honoring the reference's
    caps: per-page emit cap, total cap with early stop, stop-on-error.
    ``start_page`` is the resume cursor for incremental crawls: a caller
    that persisted its last completed page restarts from the next one
    instead of refetching the prefix."""
    frames: list[pd.DataFrame] = []
    total = 0
    for page in range(start_page, max_pages + 1):
        try:
            pdf = fetch_page(page)
        except Exception:
            break  # partial results are kept, like the reference's crawl
        if pdf is None or len(pdf) == 0:
            break
        pdf = pdf.iloc[:per_page_limit].copy()
        pdf["page"] = page
        frames.append(pdf)
        total += len(pdf)
        if total >= total_limit:
            break
    if not frames:
        return spark.createDataFrame([], schema=schema or "page int")
    all_pages = pd.concat(frames, ignore_index=True)
    if total_limit:
        all_pages = all_pages.iloc[:total_limit]
    return spark.createDataFrame(all_pages, schema=schema)
