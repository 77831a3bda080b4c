"""hh_rumors_presto_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
``jsierrahoopshype/hh-rumors-presto`` (surveyed in ``SURVEY.md``), expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Pandas UDFs
only where built-ins cannot express the semantics, Structured Streaming for
event streams.

Layout
------
- ``session``   — SparkSession factory tuned for the driver harness
- ``io``        — table loaders for the parquet fixtures
- ``registry``  — the ``queries()`` / ``oracle_sql()`` registries
- ``functions`` — scalar Column->Column function library (SURVEY.md §2.A rows 3-23)
- ``operators`` — composed operators (dedup, top-k, as-of join, similarity, ...)
- ``queries``   — one module per operator family; importing populates the registry
- ``streaming`` — Structured Streaming helpers (run-to-completion on file sources)
"""

__version__ = "0.1.0"
