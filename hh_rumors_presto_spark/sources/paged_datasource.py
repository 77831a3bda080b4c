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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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

    def partitions(self):
        return [_PagePartition(p) for p in range(1, self.max_pages + 1)]

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
