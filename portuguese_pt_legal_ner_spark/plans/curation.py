"""Composed corpus-curation pipeline: the end-to-end plan an LLM
training-data run executes over a raw crawl table —

    exact dedup (keep min doc_id per md5(text))
      → quality gate (composite score ≥ threshold)
      → deterministic md5-prefix sample
      → token-budget packing (long docs chunked first)

— as ONE lazy DataFrame plan with no materialization barriers, so
Catalyst sees the whole thing: the quality/sample filters run in the
same stages the dedup join requires, column pruning reaches the scan,
and the only shuffles are the ones the semantics require — four hash
exchanges total (big side on (md5(text), id), the slim mins
re-shuffle, the slim agg partial, the shard packing window; pinned at
4 in test_curation), of which only the big side carries the text
payload. Every
stage is engine-neutral arithmetic, so the WHOLE composition carries a
DuckDB SQL oracle in ``__spark_entry__`` (`doc_curation`) — the
integration is value-checked, not just the stages in isolation.

Scale notes (100 TB):
  * dedup-keep is deliberately NOT a window min over md5(text): an
    exact-dup flood (a million byte-identical crawl pages — the very
    case dedup exists for) shares ONE hash, so a window partitioned on
    it funnels the whole flood through one task, and AQE cannot split
    a window partition. Instead: groupBy(md5).agg(min(doc_id)) —
    partial (map-side) aggregation collapses the flood to one row per
    executor BEFORE the shuffle — then a join back on the hash with
    doc_id == keep_id, which Catalyst infers into the join keys: the
    effective COMPOSITE key (text_hash, doc_id) is unique on both
    sides, so no exchange is skewed no matter how pathological the
    duplicate distribution (plan shape pinned in test_curation);
  * the quality gate and the sample are pure column predicates on the
    join's survivors — zero extra exchanges, and the sample runs
    BEFORE packing so the packing window only sees kept rows;
  * packing shards by pmod(doc_id) — per-shard windows, never a
    global ORDER BY (see operators/sampling.pack_token_bins);
  * determinism end-to-end: every decision is a pure function of
    (row content, config) — retry-safe, engine-neutral, re-runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import hash_sample, pack_token_bins
from ..operators.textstats import quality_score_col


def curate_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.55,
    sample_fraction: float = 1.0,
    budget: int = 2048,
    shards: int = 16,
) -> DataFrame:
    """docs(doc_id, text, ...) → (doc_id, chunk_idx, shard, n_tokens,
    bin_id) for the curated, packed training subset.

    Stages and their contracts:
      1. exact dedup: of byte-identical texts, only the MIN doc_id
         survives (the exact_dedup representative rule);
      2. quality gate: round(quality_score, 6) >= quality_threshold
         (rounded on BOTH engines so the oracle's float agrees);
      3. sample: md5-prefix threshold on doc_id (granularity 1/256,
         nested fractions — see operators/sampling.hash_sample);
      4. packing: budget-token bins per shard; docs longer than the
         budget are split into (doc_id, chunk_idx) chunks first.
    """
    hashed = docs.withColumn("_th", F.md5(F.col("text")))
    mins = hashed.groupBy("_th").agg(F.min("doc_id").alias("_keep"))
    kept = (
        hashed.join(mins, "_th")
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_th", "_keep")
    )
    filtered = kept.filter(
        F.round(quality_score_col(F.col("text")), 6) >= quality_threshold
    )
    sampled = hash_sample(filtered, "doc_id", sample_fraction)
    return pack_token_bins(sampled, budget=budget, shards=shards)
