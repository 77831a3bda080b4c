"""Structured Streaming helpers (SURVEY.md §2.B "Streaming").

The fixture is a static parquet file, so streams run with
``trigger(availableNow=True)`` into a memory sink and the helper returns the
materialized result as a batch DataFrame — the same pattern as production
backfill/replay jobs. In production the source line changes to Kafka/files
and the trigger to processingTime; every transformation below is unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Stream-source schema for the events fixture.

    ``readStream`` needs an explicit schema; derive it from the batch
    reader's footer inference so both fixture vintages work (``ts`` as
    nanos-as-long in older fixtures, TIMESTAMP_NTZ micros in newer ones —
    see io.load_events).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def _split_events_dir(spark: SparkSession, sf_dir: str, n: int) -> str:
    """Materialize the events fixture as ``n`` interleaved parquet files
    (keyed by event_id % n) under a deterministic temp dir, so a stream
    with maxFilesPerTrigger=1 is forced through n out-of-order
    micro-batches — the environment-parity knob driver_sim --env-parity
    turns (the driver's micro-batching is outside our control; every
    streaming key must be invariant to it). Idempotent per (sf_dir, n)."""
    import hashlib
    import os
    import tempfile

    # Cache tag includes the fixture's (mtime, size): a regenerated
    # events.parquet at the same path must invalidate the split copy, or
    # every HH_STREAM_SPLIT run would silently reuse stale data
    # (round-5 ADVICE item). If the source is a DIRECTORY of part files
    # (not the single-file fixture), stat the newest data file instead —
    # os.stat on the directory itself would not reflect content rewrites
    # (round-6 ADVICE item).
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    if os.path.isdir(src):
        parts = [
            os.path.join(src, f)
            for f in os.listdir(src)
            if f.endswith(".parquet")
        ]
        if parts:
            st = max((os.stat(p) for p in parts), key=lambda s: s.st_mtime_ns)
    ident = f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}"
    tag = hashlib.md5(ident.encode()).hexdigest()[:8]
    # Prefix keyed by sf_dir so superseded split copies of the SAME
    # fixture can be pruned when a new tag appears (regeneration would
    # otherwise accumulate stale hh_evsplit_* dirs across a session).
    prefix = "hh_evsplit_%s_" % hashlib.md5(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:6]
    tmp = tempfile.gettempdir()
    out = os.path.join(tmp, f"{prefix}{tag}_{n}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        # best-effort prune of older split copies for this fixture (other
        # tags = superseded content; same tag other n values stay valid).
        # AGE-GATED (round-8, ADVICE item): only dirs untouched for >1h
        # are removed, so a concurrent session still streaming from an
        # older-tag copy (fixture regenerated mid-run) keeps its source —
        # a just-superseded dir survives until every plausible reader is
        # done. Legacy-format dirs (pre-round-6 `hh_evsplit_<tag8>_<n>`,
        # no sf_dir prefix — never matched by any current prefix and so
        # never pruned before) are swept under the same age gate.
        import re
        import shutil
        import time

        cutoff = time.time() - 3600
        legacy = re.compile(r"^hh_evsplit_[0-9a-f]{8}_\d+$")
        for d in os.listdir(tmp):
            superseded = d.startswith(prefix) and not d.startswith(
                f"{prefix}{tag}_"
            )
            if not (superseded or legacy.match(d)):
                continue
            p = os.path.join(tmp, d)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ev.repartition(n, F.col("event_id") % n).write.mode(
            "overwrite"
        ).parquet(out)
    return out


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    single_batch: bool = False,
    force_split: int | None = None,
) -> DataFrame:
    """File-source stream over the events fixture with ``ts`` normalized to
    a microsecond TimestampType (same truncation as io.load_events).

    HH_STREAM_SPLIT=<n> (env var, harness-only) reroutes the source
    through n interleaved files at one file per micro-batch, forcing the
    multi-batch arrival order the external driver may impose.

    ``single_batch=True`` pins the canonical one-file source regardless of
    HH_STREAM_SPLIT, guaranteeing ONE micro-batch under availableNow (a
    file source with no maxFilesPerTrigger takes every available file in
    the first batch). Watermark LATE-DROP keys use it: the set of dropped
    rows is by definition a function of the micro-batch partitioning —
    which the driver, not the query, controls — so the hash-verifiable
    contract is the single-batch arrival, where nothing is ever late and
    the final watermark deterministically selects the emitted windows.

    ``force_split=<n>`` pins an n-file interleaved multi-batch source
    regardless of environment — the inverse of ``single_batch``. The
    late-drop companion keys use it: they EXIST to exercise mid-stream
    watermark advance, so their batching must be part of the query, not
    left to the runner (the result is then identical whether or not the
    harness sets HH_STREAM_SPLIT)."""
    import os

    if single_batch and force_split:
        raise ValueError("single_batch and force_split are exclusive")
    split_n = 0 if single_batch else (
        force_split
        or int(os.environ.get("HH_STREAM_SPLIT", "0") or 0)
    )
    if split_n > 1:
        src_dir, glob_filter = (
            _split_events_dir(spark, sf_dir, split_n),
            "*.parquet",
        )
        schema = spark.read.parquet(src_dir).schema
        if max_files_per_trigger is None:
            max_files_per_trigger = 1
    else:
        src_dir, glob_filter = sf_dir, "events.parquet"
        schema = _events_schema(spark, sf_dir)
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", glob_filter)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(src_dir)
    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def run_stream_to_df(
    stream_df: DataFrame,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
    state_store: str | None = None,
) -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink contents as a batch DataFrame.

    ``state_partitions`` sizes the state store (streaming shuffles have no
    AQE, so the session's batch-oriented shuffle.partitions is wrong for
    them): the count is fixed at first planning and should track stateful
    key cardinality / executor cores — 8 suits the local fixtures, a
    cluster job would pass cores-proportional values. Set around the
    synchronous run and restored after.

    ``state_store="rocksdb"`` forces the RocksDB provider for THIS query
    regardless of HH_STATE_STORE — the stream_rocksdb_state key uses it
    so its driver row always exercises the production provider.
    """
    import os

    spark = stream_df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    # HH_STATE_STORE=rocksdb flips every stateful operator in this query
    # to the RocksDB state store (spill-to-disk state, the provider a
    # production cluster runs for large keyed state; rocksdbjni ships in
    # Spark's jars). Results are provider-invariant — pinned by
    # tests/test_streaming_rocksdb.py, which hashes a representative of
    # each stateful family under both providers. Default stays the
    # HDFS-backed in-memory provider: right for fixture-sized state and
    # for timing comparability with the recorded BASELINE.md bands.
    prov_conf = "spark.sql.streaming.stateStore.providerClass"
    old_prov = spark.conf.get(
        prov_conf,
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider",
    )
    if (
        state_store or os.environ.get("HH_STATE_STORE", "")
    ).lower() == "rocksdb":
        spark.conf.set(
            prov_conf,
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set(prov_conf, old_prov)
    return spark.table(name)
