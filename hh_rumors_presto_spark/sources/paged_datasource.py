"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the paginated source as a first-class ``spark.read.format(...)`` source.

This is the DSv2 upgrade of operators/paged_source.py (SURVEY.md §2.B
"paginated external source", generalizing the reference's serial page crawl,
fetchRumors.js:126-151): one InputPartition PER PAGE, so pages are fetched
in parallel on executors — the crawl the reference runs serially in one
Node event loop becomes an embarrassingly parallel scan. Per-page caps are
applied inside each partition reader (the reference's per-page emit cap).

The demo "remote" is the documents parquet file served in doc_id order;
swapping ``_fetch_page`` for an HTTP GET gives the reference's crawler
unchanged — partition-per-page, retry/skip policy per partition.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)


class PagedDataSource(DataSource):
    """``spark.read.format("hh_paged")`` — options:

    - ``path``: parquet file backing the pages (demo stand-in for a URL)
    - ``pageSize`` (default 100), ``perPageLimit`` (default 80),
      ``maxPages`` (default 5)
    """

    @classmethod
    def name(cls) -> str:
        return "hh_paged"

    def schema(self) -> str:
        return "doc_id long, source string, page int"

    def reader(self, schema) -> "PagedReader":
        return PagedReader(self.options)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class PagedReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        self.page_size = int(options.get("pageSize", "100"))
        self.per_page_limit = int(options.get("perPageLimit", "80"))
        self.max_pages = int(options.get("maxPages", "5"))
        self._page_pred = None  # callable(page) -> bool once filters pushed

    def pushFilters(self, filters):
        """Filter pushdown (the DSv2 SupportsPushDownFilters analog — the
        Python API has no limit pushdown, so bounded scans are expressed as
        predicates on ``page``): comparisons against the ``page`` column
        prune whole pages BEFORE any fetch happens, which is the
        reference's stop-paginating-early behavior
        (fetchRumors.js:130,148). Everything else is returned as
        unsupported for Spark to evaluate."""
        preds = []
        unsupported = []
        for f in filters:
            supported = (
                isinstance(
                    f,
                    (EqualTo, LessThan, LessThanOrEqual, GreaterThan,
                     GreaterThanOrEqual, In),
                )
                and tuple(f.attribute) == ("page",)
            )
            if not supported:
                unsupported.append(f)  # Spark applies it after the scan
            elif isinstance(f, EqualTo):
                preds.append(lambda p, v=f.value: p == v)
            elif isinstance(f, LessThan):
                preds.append(lambda p, v=f.value: p < v)
            elif isinstance(f, LessThanOrEqual):
                preds.append(lambda p, v=f.value: p <= v)
            elif isinstance(f, GreaterThan):
                preds.append(lambda p, v=f.value: p > v)
            elif isinstance(f, GreaterThanOrEqual):
                preds.append(lambda p, v=f.value: p >= v)
            else:  # In
                preds.append(lambda p, vs=tuple(f.values): p in vs)
        self._page_pred = lambda p: all(pred(p) for pred in preds)
        return unsupported

    def partitions(self):
        pages = range(1, self.max_pages + 1)
        if self._page_pred is not None:
            pages = [p for p in pages if self._page_pred(p)]
        return [_PagePartition(p) for p in pages]

    def read(self, partition: _PagePartition):
        """Executor-side page fetch. Failure policy matches the reference:
        a failing page yields nothing (partial results) instead of failing
        the scan."""
        import pyarrow.parquet as pq

        page = partition.page
        try:
            table = pq.ParquetFile(self.path).read(columns=["doc_id", "source"])
        except Exception:
            return
        pdf = table.to_pandas().sort_values("doc_id").reset_index(drop=True)
        start = (page - 1) * self.page_size
        chunk = pdf.iloc[start : start + self.page_size].iloc[: self.per_page_limit]
        for row in chunk.itertuples(index=False):
            yield (int(row.doc_id), str(row.source), page)
