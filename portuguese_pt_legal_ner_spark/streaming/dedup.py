"""Streaming exact deduplication (dropDuplicatesWithinWatermark).

The batch dedup family (operators/dedup.py) assumes the corpus is at
rest; a transcript/event firehose needs the streaming form: drop rows
whose key was already seen, with STATE BOUNDED BY THE WATERMARK — the
engine keeps a key only until the event-time watermark passes its
timestamp + delay, so state size is (distinct keys per watermark
horizon), independent of stream length. That bound is what makes
exact dedup feasible on an unbounded stream at cluster scale; an
unbounded `dropDuplicates` on a stream grows state forever.

Semantics (pinned in test_streaming.py): duplicates arriving within
the watermark delay of the first occurrence are dropped — including
across micro-batches and across restarts (the checkpoint carries the
dedup state); rows older than the watermark are late-dropped by the
watermark itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .windowed import EVENTS_STREAM_SCHEMA


def deduped_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    delay: str = "1 hour",
) -> DataFrame:
    """Shared plan: watermark on ts, then exact key-dedup with
    watermark-bounded state. Works on batch DataFrames too (falls back
    to plain dropDuplicates semantics there)."""
    wm = events.withWatermark("ts", delay)
    if events.isStreaming:
        return wm.dropDuplicatesWithinWatermark(list(keys))
    return wm.dropDuplicates(list(keys))


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("event_id",),
    delay: str = "1 hour",
) -> None:
    """Catch up on unseen event files, append only first-seen keys,
    stop (Trigger.AvailableNow). Re-running resumes from the
    checkpoint: duplicates of already-emitted keys within the
    watermark horizon stay dropped across restarts."""
    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_dir)
    q = (
        deduped_stream(stream, keys, delay)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
