"""Streaming corpus curation: the incremental form of
plans/curation.curate_corpus for a document firehose —

    watermark-bounded exact dedup on md5(text)
      → quality gate (same composite score as the batch pipeline)
      → deterministic md5-prefix sample

as one streaming plan. A crawl that lands files continuously cannot
re-run the batch pipeline over the whole corpus per increment; this
form admits each NEW document exactly once (state bounded by the
watermark horizon, like streaming/dedup), applies the SAME pure-
function quality and sampling predicates the batch pipeline uses
(stateless — they commute with streaming), and appends the curated
stream to a sink. Packing is deliberately NOT in-stream: bin assignment
depends on a per-shard running token count over the final corpus order,
so it runs as a periodic batch `pack_token_bins` over the curated
output (the standard lambda-architecture split: stateless+keyed-state
stages stream, global-order stages batch). `pack_curated_sink` is that
batch half; `run_stream curate --pack-output` and
`run_curate --from-stream` compose the two from the CLI.

Equivalence contract (pinned in test_streaming.py): with every
document inside the horizon, the streamed curated doc set equals the
batch pipeline's pre-packing survivor set on the same input — the
dedup tie-break is arrival order (first occurrence wins) rather than
min doc_id, so the test replays documents in doc_id order, where the
two rules coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import _hex_cut
from ..operators.textstats import quality_score_col
from .neardup import DOCS_STREAM_SCHEMA


def curated_stream(
    docs: DataFrame,
    quality_threshold: float = 0.55,
    sample_fraction: float = 1.0,
    delay: str = "1 hour",
) -> DataFrame:
    """streaming docs(doc_id, ts, text) → curated (doc_id, ts, text):
    first-seen text within the watermark horizon, quality-gated,
    deterministically sampled. Works on batch frames too (plain
    dropDuplicates fallback, same predicates)."""
    wm = docs.withWatermark("ts", delay).withColumn(
        "_th", F.md5(F.col("text"))
    )
    if docs.isStreaming:
        deduped = wm.dropDuplicatesWithinWatermark(["_th"])
    else:
        # batch fallback replicates curate_corpus's keep rule (min
        # doc_id survives) rather than dropDuplicates' arbitrary
        # survivor — the downstream md5 sample keys on doc_id, so an
        # arbitrary representative would give a batch caller a
        # different curated set than the batch pipeline (round-5
        # advice). Same flood-safe agg+join shape as plans/curation.
        mins = wm.groupBy("_th").agg(F.min("doc_id").alias("_keep"))
        deduped = (
            wm.join(mins, "_th")
            .filter(F.col("doc_id") == F.col("_keep"))
            .drop("_keep")
        )
    out = deduped.drop("_th").filter(
        F.round(quality_score_col(F.col("text")), 6) >= quality_threshold
    )
    if sample_fraction < 1.0:
        out = out.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            < F.lit(_hex_cut(sample_fraction))
        )
    return out


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    quality_threshold: float = 0.55,
    sample_fraction: float = 1.0,
    delay: str = "1 hour",
) -> None:
    """AvailableNow job: catch up on unseen document files, append the
    newly curated documents, stop. Dedup state lives in the checkpoint,
    so a text already admitted in an earlier run stays deduplicated
    across restarts (within the watermark horizon)."""
    stream = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(input_dir)
    q = (
        curated_stream(stream, quality_threshold, sample_fraction, delay)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def pack_curated_sink(
    spark: SparkSession,
    curated_dir: str,
    budget: int = 2048,
    shards: int = 16,
) -> DataFrame:
    """The batch half of the curation lambda split: token-budget
    packing over the curated streaming sink. Bin assignment depends on
    a per-shard running token count over the final corpus order, so it
    cannot stream; instead it runs periodically (cron, or
    run_stream curate --pack-output) over everything the stream has
    admitted so far. pack_token_bins orders each shard by
    (doc_id, chunk_idx) — a pure function of the row set, independent
    of sink file order — so stream-curate-then-pack over a doc_id-
    ordered replay reproduces the batch curate_corpus bins exactly
    (pinned in test_streaming.py)."""
    from ..operators.sampling import pack_token_bins  # noqa: PLC0415

    return pack_token_bins(
        spark.read.parquet(curated_dir), budget=budget, shards=shards
    )
