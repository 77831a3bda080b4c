"""Stream-stream join + foreachBatch sink (SURVEY.md §2.B streaming
closure; these are the two Structured Streaming capabilities beyond
windowed aggregation that production pipelines lean on).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark.registry import query
from hh_rumors_presto_spark.streaming import read_events_stream


@query(
    "stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
    """,
)
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases attributed to clicks by the same
    user within 1 hour. Both sides carry watermarks and the time-bound join
    condition lets the state store evict rows once the watermark passes
    click_ts + 1h — bounded state, the non-negotiable property for an
    unbounded stream join.

    Watermark sizing: this is a bounded REPLAY of a 30-day fixture, so the
    delay must cover the replay span (35 days here) — with a tight delay,
    an out-of-order multi-batch arrival (which the runner, not the query,
    controls) evicts state before late matches arrive and the result
    depends on batch boundaries (caught by driver_sim --env-parity's
    splitstream variant). A live deployment sizes the delay to its real
    out-of-orderness instead; the dataflow is identical."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "35 days")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "35 days")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id", "user_id")
    # run to completion via the shared helper semantics (append mode is the
    # only mode for stream-stream inner joins)
    from hh_rumors_presto_spark.streaming import run_stream_to_df

    return run_stream_to_df(joined, output_mode="append")


@query(
    "stream_foreach_batch",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: each micro-batch lands as parquet through a batch
    writer (the exactly-once pattern for sinks without a streaming
    connector — idempotent per epochId). The query returns the re-read,
    re-aggregated sink contents."""
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hh_feb_{uuid.uuid4().hex[:8]}"
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        )

    ev = read_events_stream(spark, sf_dir).select("event_id", "event_type")
    try:
        q = (
            ev.writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(out_dir, "_chk"))
            .start()
        )
        q.awaitTermination()
        # Materialize the tiny aggregate off the temp dir so the whole
        # sink+checkpoint tree can be removed before returning (repeated
        # verify/fuzz sweeps would otherwise accumulate a dir per call).
        return (
            spark.read.parquet(os.path.join(out_dir, "epoch=*"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@query(
    "stream_rollup_merge",
    oracle="""
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally MAINTAINED hourly rollup (the streaming twin of
    ts_multires_rollup): each micro-batch reduces to (key, count, exact
    DECIMAL sum) partial states which MERGE into the persisted rollup —
    read-modify-write of partials, never a reprocess of raw history. Two
    separate stream runs feed disjoint halves of the fixture through the
    same merge function, so the final state really is built by merging
    into existing state; DECIMAL partials make the result independent of
    how history was batched (the oracle aggregates raw directly).

    Scale: per refresh, work is O(|batch| + |touched buckets|); state
    rewrite is keyed and could be a partition-scoped MERGE in a lakehouse
    table — the pattern is the same."""
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hh_srm_{uuid.uuid4().hex[:8]}"
    )
    state = {"path": None, "version": 0}

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        partial = batch_df.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("tot"),
        )
        prev = state["path"]
        if prev is not None:
            old = batch_df.sparkSession.read.parquet(prev)
            partial = (
                old.unionByName(partial.select(old.columns))
                .groupBy("event_type", "bucket")
                .agg(F.sum("n").alias("n"), F.sum("tot").alias("tot"))
            )
        state["version"] += 1
        new_path = os.path.join(out_dir, f"state_v{state['version']}")
        partial.select("event_type", "bucket", "n", "tot").write.parquet(
            new_path
        )
        state["path"] = new_path
        # the new version fully supersedes the old one — keep exactly one
        if prev is not None:
            shutil.rmtree(prev, ignore_errors=True)

    try:
        for half in (0, 1):
            ev = read_events_stream(spark, sf_dir).filter(
                F.col("event_id") % 2 == half
            )
            q = (
                ev.writeStream.foreachBatch(merge_batch)
                .trigger(availableNow=True)
                .option(
                    "checkpointLocation", os.path.join(out_dir, f"_chk{half}")
                )
                .start()
            )
            q.awaitTermination()

        if state["path"] is None:
            final = spark.createDataFrame(
                [],
                "event_type string, bucket timestamp, n bigint, "
                "tot decimal(28,10)",
            )
        else:
            # materialize off the temp dir so finally can remove it all
            final = spark.read.parquet(state["path"]).localCheckpoint(
                eager=True
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    return final.select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round("tot", 2).cast("double").alias("total"),
    )


@query(
    "stream_checkpoint_resume",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once resume semantics: the same availableNow stream runs
    TWICE against one checkpoint; the file source's committed offsets
    make the second run a no-op (zero non-empty micro-batches), so the
    appended sink still holds each input row exactly once — asserted
    in-code, and proven end-to-end by the oracle comparing the sink's
    re-aggregation against a single clean pass over the source. This is
    the restart-after-crash contract a 100 TB ingest job leans on:
    reprocessing is governed by the checkpoint, not by operator memory."""
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hh_ckpt_{uuid.uuid4().hex[:8]}"
    )
    chk = os.path.join(out_dir, "_chk")
    calls = {"nonempty": 0}

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n:
            calls["nonempty"] += 1
            batch_df.write.mode("append").parquet(
                os.path.join(out_dir, "data")
            )

    try:
        for run in (1, 2):
            ev = read_events_stream(spark, sf_dir).select(
                "event_id", "event_type"
            )
            q = (
                ev.writeStream.foreachBatch(write_batch)
                .trigger(availableNow=True)
                .option("checkpointLocation", chk)
                .start()
            )
            q.awaitTermination()
            if run == 1:
                assert calls["nonempty"] >= 1, "first run must process data"
                after_first = calls["nonempty"]
        assert calls["nonempty"] == after_first, (
            "checkpoint resume reprocessed data — exactly-once broken"
        )
        # materialize the tiny aggregate so the sink + checkpoint tree can
        # be removed before returning
        return (
            spark.read.parquet(os.path.join(out_dir, "data"))
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@query(
    "stream_join_outer",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id,
                      CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id,
                 CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase'),
    wm AS (
        -- the final global watermark: min over both streams' (max event
        -- time - delay); unmatched left rows are emitted only once the
        -- watermark proves no future match can arrive
        SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
               - INTERVAL 2 HOUR AS w
    ),
    matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id
        FROM c JOIN p
          ON p.user_id = c.user_id
         AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
    )
    SELECT click_id, purchase_id, user_id FROM matched
    UNION ALL
    SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
    FROM c, wm
    WHERE c.ts + INTERVAL 1 HOUR < wm.w
      AND NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.user_id = c.user_id
            AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
      )
    """,
)
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: clicks with their attributed
    purchase, or NULL once the watermark PROVES no purchase can still
    arrive — the state-eviction semantics that make outer joins possible
    on unbounded streams at all. Clicks younger than (final watermark -
    1h match window) stay in state unemitted, and the oracle models that
    boundary EXACTLY (wm = min of both streams' max-ts - 2h delay), so
    even the withheld tail is value-hash-verified rather than waved off
    as rows-only.

    Shape at scale: identical to stream_join (keyed state, time-bound
    condition bounds state size); the only addition is the NULL-side
    emission on watermark advance.

    Arrival-order caveat (same class as the declared-rows-only
    stream_watermark): the NULL-emission boundary exists only under a
    TIGHT watermark, and a tight watermark makes the result depend on
    the runner's micro-batch arrival order — an out-of-order multi-batch
    split evicts state mid-stream (flagged by driver_sim --env-parity's
    splitstream variant). The oracle models the deterministic single-
    batch execution the single-file fixture source produces; stream_join
    demonstrates the span-covering-watermark replay configuration that
    is batching-invariant."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "leftOuter",
    ).select("click_id", "purchase_id", "user_id")
    from hh_rumors_presto_spark.streaming import run_stream_to_df

    return run_stream_to_df(joined, output_mode="append")


@query(
    "stream_merge_upsert",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           ts AS last_ts
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply — the incremental twin of the batch
    merge_upsert: each micro-batch's records are keyed upserts for
    user_id ('error' = DELETE tombstone), merged latest-wins by
    (ts, event_id) into the persisted keyed state via foreachBatch
    read-modify-write. Tombstones STAY in state so a late-arriving
    older record can never resurrect a deleted key; they are dropped
    only in the final read-out. Two independent stream runs feed
    disjoint halves of the fixture through the same merge, so the
    final table really is built by merging into existing state — and
    because per-key latest-wins max is associative, the result is
    byte-identical no matter how history was batched (the oracle
    ranks the raw history directly).

    Scale: per refresh the work is O(|batch| + |touched keys|); the
    state rewrite is keyed, so on a lakehouse table it becomes the
    exact merge_upsert join, partition-pruned to touched keys."""
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hh_smu_{uuid.uuid4().hex[:8]}"
    )
    state = {"path": None, "version": 0}
    uts = F.struct(F.col("ts"), F.col("event_id"))
    rec = F.struct(F.col("event_id"), F.col("event_type"), F.col("ts"))

    def latest_per_key(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(F.max_by(rec, uts).alias("rec"))
            .select("user_id", "rec.event_id", "rec.event_type", "rec.ts")
        )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        partial = latest_per_key(batch_df)
        prev = state["path"]
        if prev is not None:
            old = batch_df.sparkSession.read.parquet(prev)
            partial = latest_per_key(
                old.unionByName(partial.select(old.columns))
            )
        state["version"] += 1
        new_path = os.path.join(out_dir, f"state_v{state['version']}")
        partial.write.parquet(new_path)
        state["path"] = new_path
        # The new version fully supersedes the old one; dropping it here
        # keeps exactly one state version on disk at any time (repeated
        # verify/fuzz sweeps would otherwise accumulate every version).
        if prev is not None:
            shutil.rmtree(prev, ignore_errors=True)

    try:
        for half in (0, 1):
            ev = read_events_stream(spark, sf_dir).filter(
                F.col("event_id") % 2 == half
            ).select("user_id", "event_id", "event_type", "ts")
            q = (
                ev.writeStream.foreachBatch(merge_batch)
                .trigger(availableNow=True)
                .option(
                    "checkpointLocation", os.path.join(out_dir, f"_chk{half}")
                )
                .start()
            )
            q.awaitTermination()

        if state["path"] is None:
            # No micro-batch ever fired (empty source): empty final state.
            final = spark.createDataFrame(
                [], "user_id bigint, event_id bigint, event_type string, "
                "ts timestamp"
            )
        else:
            # Materialize off the temp dir (block manager) so the whole
            # out_dir — final state included — can be removed in finally
            # while the returned DataFrame stays readable.
            final = spark.read.parquet(state["path"]).localCheckpoint(
                eager=True
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    return (
        final.filter(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.col("ts").alias("last_ts"),
        )
    )
