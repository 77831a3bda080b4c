from hh_rumors_presto_spark.sources.paged_datasource import PagedDataSource

__all__ = ["PagedDataSource"]
