"""Table loaders for the driver-generated parquet fixtures.

Analog of the reference's paginated HTTP scan stage
(/root/reference/netlify/functions/fetchRumors.js:14-30,126-151) generalized
to columnar sources: ``spark.read.parquet`` gives predicate pushdown, column
pruning and partition-parallel scans for free — see SURVEY.md §2.A row 5.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from parquet FOOTER metadata —
    no Spark job, no data read. A planner statistic (r12, guide §3: pick
    the strategy from input size, the way Spark's own broadcast
    threshold does), used to choose between result-identical physical
    shapes; it is not a result cache."""
    import pyarrow.dataset as ds

    return ds.dataset(table_path(sf_dir, name)).count_rows()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy: no data is read until an action.

    ``events`` is routed through :func:`load_events` (ns-timestamp
    normalization); everything else is a plain parquet scan.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with ``ts`` as a proper TimestampType.

    The fixture generation has shipped ``ts`` two ways across rounds:

    - parquet TIMESTAMP(NANOS), which Spark's parquet reader rejects
      outright ([PARQUET_TYPE_ILLEGAL]). The supported path is
      ``spark.sql.legacy.parquet.nanosAsLong`` (public Spark conf,
      SPARK-40819): read nanos as LONG, then integer-div to micros —
      truncation, exactly what DuckDB's TIMESTAMP_NS -> TIMESTAMP cast
      does, so oracle SQL can use ``CAST(ts AS TIMESTAMP)``.
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads
      as TIMESTAMP_NTZ; normalize to TIMESTAMP (session tz is UTC) so
      downstream ``unix_micros``/range frames see one type either way.

    Branch on the loaded dtype so both fixture vintages work unchanged.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view so SQL-form queries can run."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def scoped_tmp_dir(spark: SparkSession, tag: str, sf_dir: str) -> str:
    """Session- and fixture-scoped scratch directory path for keys that
    must materialize intermediate files (streaming sources, DSv2 sink
    roundtrips): /tmp/hh_<tag>_<sf_basename>_<applicationId>. The
    applicationId keys it to ONE SparkSession (concurrent verifier
    processes never collide; a driver retry within a session reuses and
    must rebuild-or-overwrite), the sf basename keys it to the fixture.
    The single definition of the scoping rule — callers must not
    hand-roll variants (r11 review: three divergent copies)."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"hh_{tag}_{os.path.basename(os.path.abspath(sf_dir))}"
        f"_{spark.sparkContext.applicationId}",
    )
