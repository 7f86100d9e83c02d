"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference is strictly batch (src/inference.py:131-168) and the KG
path stays batch-incremental (see incremental.py) — this module covers
the classical streaming-aggregation surface a transcript/event firehose
needs when the input really is a stream:

  readStream(file source) → withWatermark(event time)
    → groupBy(window(ts), event_type).count → append sink.

Semantics under test (test_streaming.py):
  * append mode emits a window only once the watermark passes its end
    (finalized windows — exactly-once per window across restarts, the
    checkpoint carries both the file ledger and the watermark);
  * events arriving later than the watermark allowance are DROPPED,
    not double-counted — the late-data contract that a naive batch
    re-aggregation silently violates.

At cluster scale this is the canonical shuffle-on-(window, key) hash
aggregation with partial aggregation map-side; state store size is
bounded by (windows in flight × keys), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def windowed_counts(events: DataFrame, window: str = "10 minutes",
                    delay: str = "10 minutes") -> DataFrame:
    """Shared plan for batch and stream: tumbling event-time windows
    per event_type. On a streaming input, `withWatermark` bounds state
    and defines the late-drop horizon."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    delay: str = "10 minutes",
) -> None:
    """Catch up on unseen event files, emit finalized windows, stop
    (Trigger.AvailableNow). Re-running resumes from the checkpoint:
    already-emitted windows are not re-emitted, late rows behind the
    persisted watermark are dropped."""
    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_dir)
    q = (
        windowed_counts(stream, window, delay)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
