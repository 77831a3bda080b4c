from hh_rumors_presto_spark.streaming.helpers import (
    read_events_stream,
    run_stream_to_df,
)

__all__ = ["read_events_stream", "run_stream_to_df"]
