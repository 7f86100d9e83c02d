"""Streaming NEAR-duplicate detection: in-stream simhash + stateful
LSH band buckets with watermark-bounded state.

The batch near-dup family (operators/dedup.py) blocks with a band
self-join over a corpus at rest. A firehose training-data pipeline
needs the incremental form: as documents stream in, emit (doc_a,
doc_b, hamming) for every new document whose simhash lies within
`max_hamming` of a document seen EARLIER in the stream — where
"earlier" is bounded by the watermark delay, exactly like
streaming/dedup.py bounds exact-dedup state.

Shape (the streaming analog of simhash_neardup_pairs):

  * simhash is computed IN-STREAM by an Arrow-batched pandas UDF —
    row-local (one doc's tokens → one 64-bit word), so it needs no
    aggregation state. The hash family is md5-low-64 per token
    (hashlib), deterministic across executors; it does not need to
    match the batch xxhash64 family — near-dup semantics only need
    internal consistency;
  * each document fans out to `n_bands` bit-slice keys; the stream is
    grouped by (band_idx, band_val) — the hash exchange carries
    (doc_id, sim, ts, band) only, never text (the batch rule);
  * per-bucket state (applyInPandasWithState, EventTimeTimeout) holds
    the docs seen in that bucket within the horizon; a new doc
    hamming-verifies against them (and earlier docs of its own
    micro-batch) and is appended. The pigeonhole bound
    max_hamming ≤ n_bands-1 is ENFORCED like the batch operator;
  * state per bucket is CAPPED at `max_bucket_size` entries: past the
    cap, new docs verify against the bucket's FIRST (representative)
    entry only — the streaming analog of the batch star-link: a
    boilerplate flood stays linked to its representative at O(1)
    state and O(1) work per doc instead of growing the bucket without
    bound. Entries older than the delay window (relative to the
    bucket's newest event) are pruned; an idle bucket's whole state is
    dropped by the event-time timeout.

A pair agreeing on several bands is emitted once per agreeing band
micro-batch-locally; consumers wanting a distinct pair set dedupe on
(doc_a, doc_b) downstream (streaming/dedup.deduped_stream composes).

Restart semantics (pinned in test_streaming.py): bucket state lives in
the checkpoint, so near-dups arriving in a LATER run still pair with
in-horizon documents from an earlier run.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("hamming", T.IntegerType()),
    ]
)

# state: parallel arrays of in-horizon bucket members + newest event ts
STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("sims", T.ArrayType(T.LongType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("last_us", T.LongType()),
    ]
)

MAX_STREAM_BUCKET = 1000


def simhash64_pandas(text):
    """Arrow-batched per-document 64-bit simhash (md5-low-64 token
    hashes, majority rule) — the row-local form streaming needs; the
    batch path's explode→aggregate shape (dedup.simhash_table) covers
    corpora at rest."""
    import hashlib  # noqa: PLC0415

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _sim(texts):
        bitpos = np.arange(64, dtype=np.uint64)
        out = []
        for t in texts:
            toks = (t or "").split()
            if not toks:
                out.append(0)
                continue
            hs = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
                    )
                    for tok in toks
                ],
                dtype=np.uint64,
            )
            bits = (hs[:, None] >> bitpos) & np.uint64(1)  # [n_tok, 64]
            maj = bits.sum(axis=0) * 2 > len(toks)
            word = int((maj.astype(np.uint64) << bitpos).sum())
            out.append(word - (1 << 64) if word >= (1 << 63) else word)
        return pd.Series(out, dtype="int64")

    return _sim(text)


def _pair_fn(max_hamming: int, delay_sec: int, max_bucket_size: int):
    delay_us = delay_sec * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        doc_ids: list[int]
        sims: list[int]
        ts_us: list[int]
        if state.exists:
            doc_ids, sims, ts_us, _last = state.get
            doc_ids, sims, ts_us = list(doc_ids), list(sims), list(ts_us)
        else:
            doc_ids, sims, ts_us = [], [], []

        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            us = (
                (ts.astype("int64") // 1000)
                if ts.dtype == "datetime64[ns]"
                else ts.astype("int64")
            )
            rows.extend(zip(pdf["doc_id"].tolist(), pdf["sim"].tolist(), us.tolist()))
        rows.sort(key=lambda r: (r[2], r[0]))  # event-time order, det. ties

        out_a: list[int] = []
        out_b: list[int] = []
        out_h: list[int] = []
        for doc_id, sim, t_us in rows:
            # star-capped verify: full bucket past the cap compares
            # against the representative (first entry) only
            cand = range(len(doc_ids)) if len(doc_ids) <= max_bucket_size else [0]
            for i in cand:
                if doc_ids[i] == doc_id:
                    continue
                # mask to 64 bits: the words are two's-complement longs
                # and Python ints are infinite-precision
                h = ((sim ^ sims[i]) & 0xFFFFFFFFFFFFFFFF).bit_count()
                if h <= max_hamming:
                    a, b = sorted((doc_ids[i], doc_id))
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(h)
            if len(doc_ids) <= max_bucket_size:
                doc_ids.append(doc_id)
                sims.append(sim)
                ts_us.append(t_us)

        newest = max(ts_us) if ts_us else rows[-1][2]
        # prune entries that fell out of the horizon relative to the
        # bucket's newest event (the watermark advances at least this far)
        keep = [i for i, t in enumerate(ts_us) if t >= newest - delay_us]
        if len(keep) != len(ts_us):
            doc_ids = [doc_ids[i] for i in keep]
            sims = [sims[i] for i in keep]
            ts_us = [ts_us[i] for i in keep]
        state.update((doc_ids, sims, ts_us, newest))
        # idle buckets are dropped once the watermark passes newest+delay
        state.setTimeoutTimestamp(newest // 1000 + delay_sec * 1000)

        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "hamming": out_h}
            )

    return fn


def neardup_pairs_stream(
    docs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    delay_sec: int = 3600,
    max_bucket_size: int = MAX_STREAM_BUCKET,
) -> DataFrame:
    """streaming docs(doc_id, ts, text) → (doc_a, doc_b, hamming)
    near-dup pairs within the watermark horizon. The input must carry
    a watermark on ts (drives late-drop and the bucket timeout)."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole recall "
            f"bound of n_bands-1={n_bands - 1}; raise n_bands"
        )
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    sk = docs.select(
        "doc_id", "ts", simhash64_pandas(F.col("text")).alias("sim")
    )
    bands = sk.select(
        "doc_id",
        "ts",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("sim"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "ts", "sim", "band.band_idx", "band.band_val")
    return bands.groupBy("band_idx", "band_val").applyInPandasWithState(
        _pair_fn(max_hamming, delay_sec, max_bucket_size),
        outputStructType=PAIR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_neardup_pairs(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    delay: str = "1 hour",
    delay_sec: int = 3600,
    max_bucket_size: int = MAX_STREAM_BUCKET,
) -> None:
    """AvailableNow job: catch up on unseen document files, append
    newly discovered near-dup pairs, stop. Resumable: bucket state
    (in-horizon simhashes) lives in the checkpoint across runs."""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", delay)
    )
    q = (
        neardup_pairs_stream(
            stream, max_hamming, n_bands, delay_sec, max_bucket_size
        )
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
