"""Crash-recovery drive for the streaming checkpoint contract (tier-3
items 2 and 5, started in round 10).

stream_checkpoint_resume proves the completed-run/no-op-resume case;
this suite proves the CRASH case: a 5-micro-batch stream is stopped
after its first batch commits ("the executor died between batches"),
then restarted against the same checkpoint, and the sink must equal a
clean single pass over the source — exactly once, no gaps, no
duplicates.

The sink is the idempotent-foreachBatch pattern every production
exactly-once job uses: each epoch writes to a DETERMINISTIC
epoch-keyed directory with mode=overwrite, so a replayed epoch (the
at-least-once window around a crash) overwrites itself instead of
appending a duplicate. The test also replays one epoch EXPLICITLY to
pin that idempotency, covering the duplicate-batch-delivery contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.streaming.helpers import read_events_stream


def _epoch_sink(out_dir: str, written: list):
    def write_batch(batch_df, epoch_id: int) -> None:
        # idempotent: deterministic per-epoch path + overwrite — a
        # replayed epoch rewrites the same files rather than duplicating
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        written.append(epoch_id)

    return write_batch


def test_crash_between_batches_resumes_exactly_once(spark, sf_dir):
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hh_crash_{uuid.uuid4().hex[:8]}"
    )
    chk = os.path.join(out_dir, "_chk")
    data = os.path.join(out_dir, "data")
    written: list = []
    try:
        # phase 1: 5-file source, one file per micro-batch, continuous
        # trigger; stop the query once >= 1 batch has committed but
        # before all 5 have — the crash point
        ev = read_events_stream(spark, sf_dir, force_split=5).select(
            "event_id", "event_type"
        )
        q = (
            ev.writeStream.foreachBatch(_epoch_sink(data, written))
            .option("checkpointLocation", chk)
            # 1 s between triggers leaves a wide, timing-robust window to
            # stop after the first batch but before the fifth
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while not written and time.time() < deadline:
            time.sleep(0.1)
        assert written, "first micro-batch never committed"
        q.stop()  # crash between (or possibly inside) batches
        q.awaitTermination()
        n_before = len(set(written))
        assert n_before < 5, (
            "stream drained fully before the stop — crash point missed; "
            f"epochs: {sorted(set(written))}"
        )

        # phase 2: restart against the SAME checkpoint; availableNow
        # drains the remaining files (replaying at most the in-flight
        # epoch, which the idempotent sink absorbs)
        ev2 = read_events_stream(spark, sf_dir, force_split=5).select(
            "event_id", "event_type"
        )
        q2 = (
            ev2.writeStream.foreachBatch(_epoch_sink(data, written))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()

        # exactly-once: the union of epoch directories equals one clean
        # pass over the source — same ids, each exactly once
        got = spark.read.parquet(os.path.join(data, "epoch=*"))
        src = io.load_events(spark, sf_dir).select("event_id")
        assert got.count() == got.select("event_id").distinct().count()
        assert got.count() == src.count()
        assert got.join(src, "event_id", "left_anti").count() == 0

        # duplicate-batch delivery: replay the FIRST epoch by hand; the
        # idempotent sink must leave the result byte-identical.
        # localCheckpoint materializes the epoch BEFORE the overwrite
        # deletes it (a lazy read of the dir being overwritten is the
        # read-your-own-overwrite trap).
        first_epoch = sorted(set(written))[0]
        epoch_dir = os.path.join(data, f"epoch={first_epoch}")
        epoch_df = spark.read.parquet(epoch_dir).localCheckpoint(eager=True)
        before = sorted(r.event_id for r in epoch_df.select("event_id").collect())
        epoch_df.write.mode("overwrite").parquet(epoch_dir)
        after = sorted(
            r.event_id
            for r in spark.read.parquet(epoch_dir).select("event_id").collect()
        )
        assert before == after
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
