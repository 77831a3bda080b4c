"""UDF/UDAF/UDTF surface + multimodal binary-column plumbing
(SURVEY.md §2.B last table; BASELINE.json multimodal mandate).

The pandas UDFs here do only rational arithmetic so their outputs are
IEEE-identical to the SQL oracles — demonstrating that the Arrow batch path
itself introduces no drift. The multimodal decode is a clearly-marked STUB
(image/audio libs are not in this container): the Spark-side plumbing —
binary column, mapInPandas batch iteration, typed metadata schema — is real
and oracle-checked; only the pixel decoding is fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@F.pandas_udf(T.DoubleType())
def _scaled_score(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF (Arrow-batched): rational transform.
    Widened to float64 first — a FLOAT-typed fixture would otherwise keep
    the whole chain in float32 while the SQL oracle promotes to DOUBLE."""
    v = v.astype("float64")
    return (v * 1.1 + 2.0) / (v.abs() + 1.0)


@query(
    "udf_scalar",
    oracle="""
    SELECT event_id,
           (CAST(value AS DOUBLE) * 1.1 + 2.0)
               / (abs(CAST(value AS DOUBLE)) + 1.0) AS score
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over events.value — the sanctioned slow path
    (SURVEY.md §2.B udf_scalar); Arrow transfer, not per-row pickling."""
    ev = io.load_table(spark, sf_dir, "events")
    return ev.select("event_id", _scaled_score(F.col("value")).alias("score"))


_UDAF_SCHEMA = (
    "user_id bigint, n bigint, total_cents bigint, "
    "first_event bigint, last_event bigint"
)


def _per_user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: exact integer stats per user (value -> cents
    via floor(v*100 + 0.5), identical to the SQL oracle's expression)."""
    import numpy as np

    # float64 widen: a FLOAT-typed fixture would keep numpy in float32,
    # whose *100 rounding can cross the floor boundary the oracle's
    # DOUBLE path doesn't (same contract as streaming._running_totals)
    cents = np.floor(
        pdf["value"].to_numpy(dtype="float64") * 100.0 + 0.5
    ).astype("int64")
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "total_cents": [int(cents.sum())],
            "first_event": [int(pdf["event_id"].min())],
            "last_event": [int(pdf["event_id"].max())],
        }
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT user_id, count(*) AS n,
           CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
           min(event_id) AS first_event,
           max(event_id) AS last_event
    FROM events
    GROUP BY user_id
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via GroupedData.applyInPandas: one pandas DataFrame per
    user_id in, one summary row out. Shuffles once on the group key — same
    cost shape as a built-in hash agg, plus the Arrow hop."""
    ev = io.load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _per_user_stats, schema=_UDAF_SCHEMA
    )


@query(
    "udtf_extract",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 25 = 0
    """,
)
def udtf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF shape (one row -> many, generalizing the reference's
    parseTagPage extractor, fetchRumors.js:75-124): positional token
    explosion via posexplode (1-based to match SQL subscripts)."""
    docs = io.load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.posexplode(F.split("text", " ")))
        .select(
            "doc_id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("token")
        )
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: the real version would call PIL/libav here. The
    container has neither, so metadata is derived deterministically from the
    byte payload — the batch iteration, binary Arrow transfer, and typed
    output schema are the real plumbing under test."""
    for pdf in batches:
        n_bytes = pdf["blob"].map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "fake_width": n_bytes % 640,
                "fake_height": (n_bytes * 7) % 480,
                "format": "stub/raw",
            }
        )


@query(
    "mm_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
           CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS fake_height,
           'stub/raw' AS format
    FROM documents
    """,
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing: text -> binary column -> mapInPandas
    batch decode -> typed metadata. Decode itself is a stub (see
    _decode_stub); at 100 TB this is the exact shape for image/audio
    feature extraction — opaque bytes in, columnar features out, no
    driver involvement."""
    docs = io.load_table(spark, sf_dir, "documents")
    with_blob = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    return with_blob.mapInPandas(_decode_stub, schema=_DECODE_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_no,
           n_frames
    FROM (
        SELECT doc_id, CAST(octet_length(encode(text)) % 5 + 1 AS BIGINT) AS n_frames
        FROM documents
        WHERE doc_id % 20 = 0
    )
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: derive a frame count
    per blob, explode one row per sampled frame (sequence+explode — the
    real sampler would seek into the container instead)."""
    docs = io.load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    n_frames = (F.octet_length(F.encode("text", "UTF-8")) % 5 + 1).cast("long")
    return (
        docs.select("doc_id", n_frames.alias("n_frames"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1)).alias(
                "frame_no"
            ),
            "n_frames",
        )
        .select("doc_id", "frame_no", "n_frames")
    )


@query(
    "udaf_arrow_grouped",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via GroupedData.applyInArrow (Spark 4): the zero-copy
    sibling of applyInPandas — each group arrives as a pyarrow.Table, no
    pandas materialization. Integer cent arithmetic keeps the sum exact
    and reduction-order-insensitive. Same one-shuffle cost shape as a
    built-in hash agg."""
    import pyarrow as pa

    def per_user(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(tbl.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": [tbl.column("user_id")[0].as_py()],
                "n": [tbl.num_rows],
                "total_cents": [pc.sum(cents).as_py()],
            },
            schema=pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n", pa.int64()),
                    ("total_cents", pa.int64()),
                ]
            ),
        )

    ev = io.load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .applyInArrow(
            per_user, schema="user_id bigint, n bigint, total_cents bigint"
        )
    )
