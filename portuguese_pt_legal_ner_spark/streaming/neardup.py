"""Streaming NEAR-duplicate detection: in-stream simhash + stateful
LSH band buckets with watermark-bounded state.

The batch near-dup family (operators/dedup.py) blocks with a band
self-join over a corpus at rest. A firehose training-data pipeline
needs the incremental form: as documents stream in, emit (doc_a,
doc_b, hamming) for every new document whose simhash lies within
`max_hamming` of a document seen EARLIER in the stream and within the
horizon — the emission rule is exact and per-pair: share a band,
hamming ≤ k, AND event-time gap ≤ `delay_sec` (checked at verify
time, not just via state pruning, so the pair set is a function of
event times alone, never of micro-batch boundaries — value-checked
against a per-horizon-window DuckDB oracle in `stream_neardup_horizon`
and in test_streaming). One caveat: a LATE row (event time behind the
bucket's newest, admitted by the watermark allowance) pairs only with
members still inside the state horizon of the bucket's newest event —
members are pruned `delay_sec` behind `newest`, so a late row can miss
partners in the sliver [newest-2·delay, newest-delay); that sliver is
the standard price of bounded streaming state.

Shape (the streaming analog of simhash_md5_neardup_pairs):

  * simhash is computed IN-STREAM by an Arrow-batched pandas UDF —
    row-local (one doc's tokens → one 32-bit word), so it needs no
    aggregation state. The hash family is the SAME engine-neutral
    md5 family as the batch ``simhash_md5_table`` (bit i = token
    majority of the low bit of md5 hex digit i), asserted bit-equal
    in test_streaming — so the stream's finalized-horizon pair set is
    value-checkable against the batch pair set AND against the DuckDB
    oracle that already checks the batch path. Hashing is batched:
    one md5 per DISTINCT token of the Arrow batch, then one numpy
    pass assembles every document's signature (no per-doc Python
    loop over tokens);
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
    bound. While a flood keeps a capped bucket active, the
    representative's timestamp (and the bucket's `newest`) advance
    with the INCOMING rows even though nothing is appended — an
    ongoing flood must neither expire its own state mid-flood nor
    freeze the event-time timeout below the advancing watermark
    (setTimeoutTimestamp rejects a timestamp ≤ watermark, so a frozen
    `newest` would crash the query exactly in the sustained-flood
    case the cap exists for). Capped buckets are AUDITED: pass
    `capped_acc` (a SparkContext accumulator) and every bucket-batch
    that hits the cap increments it — stream_neardup_pairs logs the
    count after each run (the no-silent-caps rule);
  * entries older than the delay window (relative to the bucket's
    newest event) are pruned; an idle bucket's whole state is dropped
    by the event-time timeout.

A pair agreeing on several bands is emitted once per agreeing band
micro-batch-locally; consumers wanting a distinct pair set dedupe on
(doc_a, doc_b) downstream (streaming/dedup.deduped_stream composes).
With ``emit_once_per_pair`` (valid only when the star cap is
unreachable) the bucket of the pair's LOWEST agreeing band is the sole
emitter — same distinct pair set, sink traffic divided by the
band-agreement factor.

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
        T.StructField("hamming", T.LongType()),
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

SIMHASH_BITS = 32  # the md5 hex-digit family width (simhash_md5_table)

# Java \s (Spark's split('\\s+')) is ASCII-only: [ \t\n\x0B\f\r].
# Spark's trim() strips ONLY the space character. The replica below is
# asserted bit-equal to simhash_md5_table in test_streaming.
_JAVA_WS = r"[ \t\n\x0b\f\r]+"


def _simhash32_md5_batch(texts) -> np.ndarray:
    """Vectorized batch simhash: ONE md5 per distinct token of the
    batch, then a single numpy pass (unique/inverse + add.reduceat)
    assembles every document's 32-bit signature — no Python loop over
    docs × tokens on the firehose path (round-4 verdict item 5).

    Bit i = majority, over the doc's token OCCURRENCES, of the low bit
    of hex digit i of md5(token) — identical arithmetic to the batch
    ``dedup.simhash_md5_table`` (hex digit 2k is the high nibble of
    digest byte k, 2k+1 the low nibble; 'odd hex digit' == low bit
    set)."""
    import hashlib  # noqa: PLC0415
    import re  # noqa: PLC0415

    split = re.compile(_JAVA_WS).split
    tok_lists = [split((t or "").strip(" ")) for t in texts]
    counts = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
    flat: list[str] = [tok for tl in tok_lists for tok in tl]
    # hash-based factorize, not np.unique: unique only needs the
    # token→digest mapping, and np.unique SORTS the whole flat token
    # array (O(T log T) string comparisons — measured the dominant
    # per-batch cost at bench sf); factorize's hash table is O(T) and
    # yields the same (uniques, inverse) mapping up to unique order,
    # which the per-token digest lookup makes irrelevant
    inv, uniq = pd.factorize(np.array(flat, dtype=object), sort=False)
    digests = np.frombuffer(
        b"".join(hashlib.md5(u.encode("utf-8")).digest() for u in uniq),
        dtype=np.uint8,
    ).reshape(-1, 16)
    bits = np.empty((len(uniq), SIMHASH_BITS), dtype=np.int64)
    bits[:, 0::2] = (digests >> 4) & 1  # even hex digits: high nibbles
    bits[:, 1::2] = digests & 1  # odd hex digits: low nibbles
    tok_bits = bits[inv]  # [total_tokens, 32]
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sums = np.add.reduceat(tok_bits, starts, axis=0)  # every doc ≥1 token
    maj = (2 * sums) > counts[:, None]
    return (maj.astype(np.int64) << np.arange(SIMHASH_BITS, dtype=np.int64)).sum(
        axis=1
    )


def simhash32_md5_pandas(text):
    """Arrow-batched per-document 32-bit md5 simhash — the row-local
    form streaming needs; the batch path's explode→aggregate shape
    (dedup.simhash_md5_table) covers corpora at rest and carries the
    DuckDB oracle. Same hash family in both, so stream and batch pair
    sets are directly comparable."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _sim(texts):
        if not len(texts):
            return pd.Series([], dtype="int64")
        return pd.Series(_simhash32_md5_batch(texts), dtype="int64")

    return _sim(text)


# 8-bit popcount lookup — numpy<2 has no bitwise_count; indexing the
# uint8 view of a uint64 xor through this table vectorizes the hamming
# verify across a whole bucket (the firehose hot path)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

_MASK64 = 0xFFFFFFFFFFFFFFFF


def _pair_fn(
    max_hamming: int,
    delay_sec: int,
    max_bucket_size: int,
    capped_acc=None,
    n_bands: int | None = None,
    emit_once_per_pair: bool = False,
):
    delay_us = delay_sec * 1_000_000
    width = SIMHASH_BITS // n_bands if n_bands else 0
    band_mask = (1 << width) - 1 if width else 0

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

        # fast path accumulates numpy blocks, sequential path scalars;
        # both concat/hand the lists to one pd.DataFrame at yield time
        out_a: list = []
        out_b: list = []
        out_h: list = []
        capped = False
        n = len(sims)

        # ---- fully vectorized fast path -------------------------------
        # When the bucket cannot hit the star cap this invocation
        # (existing members + incoming rows ≤ cap) the sequential
        # append loop is equivalent to one all-pairs verify: row j
        # pairs with every EARLIER row i (state first, then incoming in
        # (ts, doc_id) order) with ts_i ≥ ts_j − delay, doc_ids
        # distinct, hamming ≤ k. One numpy block (XOR outer product +
        # uint8-view popcount) replaces the per-row Python loop that
        # dominated the streaming query at bench sf (guide §4.2);
        # emitted pair SET and hamming values are identical — order
        # within the micro-batch output differs, which the parquet-
        # append + dropDuplicates consumer contract never observes.
        if rows and n + len(rows) <= max_bucket_size:
            m = len(rows)
            all_ids = np.concatenate(
                [np.array(doc_ids, dtype=np.int64),
                 np.fromiter((r[0] for r in rows), np.int64, m)]
            )
            all_sims = np.concatenate(
                [np.array(sims, dtype=np.uint64),
                 np.fromiter(((r[1] & _MASK64) for r in rows), np.uint64, m)]
            )
            all_ts = np.concatenate(
                [np.array(ts_us, dtype=np.int64),
                 np.fromiter((r[2] for r in rows), np.int64, m)]
            )
            total = n + m
            # chunk the incoming block so the [chunk, total] popcount
            # matrix stays cache-friendly even for a flood bucket
            chunk = max(1, min(m, (1 << 22) // max(total, 1)))
            for c0 in range(n, total, chunk):
                c1 = min(c0 + chunk, total)
                x = all_sims[None, c0:c1].T ^ all_sims[None, :c1]
                hs = _POP8[x.view(np.uint8)].reshape(c1 - c0, c1, 8).sum(
                    axis=2, dtype=np.int64
                )
                ok = (hs <= max_hamming) & (
                    all_ts[None, :c1] >= all_ts[c0:c1, None] - delay_us
                ) & (all_ids[None, :c1] != all_ids[c0:c1, None])
                # keep only earlier members: strictly lower index
                ok &= np.arange(c1)[None, :] < np.arange(c0, c1)[:, None]
                jj, ii = np.nonzero(ok)
                if len(jj) and emit_once_per_pair:
                    # canonical-band suppression: emit a pair only in
                    # the bucket of its LOWEST agreeing band (computable
                    # from the sim words in state) — a pair agreeing on
                    # k bands otherwise crosses the Arrow boundary and
                    # the sink k times just to be dropDuplicates'd away
                    # (measured 8.7M emitted vs 4.85M distinct at
                    # sf1.0). Valid only when the star cap cannot trip
                    # anywhere in the stream (see neardup_pairs_stream):
                    # a capped bucket emits representative pairs only,
                    # so suppression elsewhere could lose a pair whose
                    # canonical bucket was capped. The distinct pair
                    # set is unchanged: this bucket's band agrees for
                    # every pair here, so argmax finds a band ≤ ours
                    # and exactly one bucket keeps each pair.
                    xp = all_sims[ii] ^ all_sims[jj + c0]
                    agree = np.stack(
                        [
                            ((xp >> np.uint64(b * width))
                             & np.uint64(band_mask)) == 0
                            for b in range(n_bands)
                        ]
                    )
                    keep_pairs = agree.argmax(axis=0) == key[0]
                    jj, ii = jj[keep_pairs], ii[keep_pairs]
                if len(jj):
                    ia = all_ids[ii]
                    ib = all_ids[jj + c0]
                    # accumulate numpy blocks; one concat at yield time
                    # (8.7M .tolist() appends measured as a dominant
                    # cost of the dense-bucket batch at bench sf)
                    out_a.append(np.minimum(ia, ib))
                    out_b.append(np.maximum(ia, ib))
                    out_h.append(hs[jj, ii])
            # append the raw incoming values (exactly what the
            # sequential loop stores in state)
            doc_ids.extend(r[0] for r in rows)
            sims.extend(r[1] for r in rows)
            ts_us.extend(r[2] for r in rows)
            newest = max([*ts_us, rows[-1][2]])
            keep = [i for i, t in enumerate(ts_us) if t >= newest - delay_us]
            if len(keep) != len(ts_us):
                doc_ids = [doc_ids[i] for i in keep]
                sims = [sims[i] for i in keep]
                ts_us = [ts_us[i] for i in keep]
            state.update((doc_ids, sims, ts_us, newest))
            timeout_ms = max(
                newest // 1000 + delay_sec * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
            if out_a:
                yield pd.DataFrame(
                    {
                        "doc_a": np.concatenate(out_a),
                        "doc_b": np.concatenate(out_b),
                        "hamming": np.concatenate(out_h),
                    }
                )
            return
        # ---- sequential path (cap may trip mid-invocation) ------------
        # growing uint64 buffer mirroring `sims` — the verify XORs one
        # incoming word against the WHOLE bucket in numpy (uint8-view
        # popcount table) instead of a Python loop per member; dense
        # near-dup buckets made that loop the dominant cost of the
        # streaming query (measured at sf0.1, identical 46,946-pair
        # output: 5.6 s -> 4.0 s end-to-end)
        buf = np.empty(max(16, 2 * n), dtype=np.uint64)
        tbuf = np.empty(len(buf), dtype=np.int64)
        if n:
            buf[:n] = np.array(sims, dtype=np.uint64)
            tbuf[:n] = np.array(ts_us, dtype=np.int64)
        for doc_id, sim, t_us in rows:
            # the horizon is enforced PER PAIR at verify time (member
            # event time within delay of the incoming row), not only by
            # the end-of-invocation prune — otherwise a member due to
            # expire still pairs with every row of the invocation that
            # expires it, and the emitted set depends on micro-batch
            # boundaries instead of event times alone
            if n > max_bucket_size:
                # star-capped verify: full bucket compares against the
                # representative (first entry) only
                capped = True
                if doc_ids[0] != doc_id and ts_us[0] >= t_us - delay_us:
                    h = ((sim ^ sims[0]) & _MASK64).bit_count()
                    if h <= max_hamming:
                        a, b = sorted((doc_ids[0], doc_id))
                        out_a.append(a)
                        out_b.append(b)
                        out_h.append(h)
                # the rep stands for the capped rows, so its horizon
                # follows the flood WITHIN the invocation too — a
                # single-run flood longer than the delay must stay
                # linked to its representative, same rule as the
                # end-of-invocation advancement below
                if ts_us and t_us > ts_us[0]:
                    ts_us[0] = t_us
                    tbuf[0] = t_us
            else:
                if n:
                    x = buf[:n] ^ np.uint64(sim & _MASK64)
                    hs = _POP8[x.view(np.uint8)].reshape(n, 8).sum(
                        axis=1, dtype=np.int64
                    )
                    ok = (hs <= max_hamming) & (
                        tbuf[:n] >= t_us - delay_us
                    )
                    for i in np.flatnonzero(ok):
                        if doc_ids[i] == doc_id:
                            continue
                        a, b = sorted((doc_ids[i], doc_id))
                        out_a.append(a)
                        out_b.append(b)
                        out_h.append(int(hs[i]))
                doc_ids.append(doc_id)
                sims.append(sim)
                ts_us.append(t_us)
                if n == len(buf):
                    buf = np.concatenate([buf, np.empty(len(buf), np.uint64)])
                    tbuf = np.concatenate(
                        [tbuf, np.empty(len(tbuf), np.int64)]
                    )
                buf[n] = sim & _MASK64
                tbuf[n] = t_us
                n += 1

        # `newest` advances with the INCOMING rows even when the cap
        # stopped appends — a frozen newest would (a) let the watermark
        # expire an actively-flooding bucket and (b) put the event-time
        # timeout below the watermark, which setTimeoutTimestamp
        # rejects (query crash — round-4 advice, high)
        incoming_max = rows[-1][2] if rows else 0
        newest = max([*ts_us, incoming_max])
        if capped:
            if capped_acc is not None:
                capped_acc.add(1)
            # an ongoing flood keeps its representative alive: the rep
            # stands for rows the cap refused to store, so its horizon
            # follows the flood's newest arrival, not its own age
            ts_us[0] = max(ts_us[0], incoming_max)
        # prune entries that fell out of the horizon relative to the
        # bucket's newest event (the watermark advances at least this far)
        keep = [i for i, t in enumerate(ts_us) if t >= newest - delay_us]
        if len(keep) != len(ts_us):
            doc_ids = [doc_ids[i] for i in keep]
            sims = [sims[i] for i in keep]
            ts_us = [ts_us[i] for i in keep]
        state.update((doc_ids, sims, ts_us, newest))
        # idle buckets are dropped once the watermark passes newest+delay;
        # clamp strictly above the current watermark — late (allowed)
        # rows can carry event times the watermark already passed
        timeout_ms = max(
            newest // 1000 + delay_sec * 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)

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
    capped_acc=None,
    emit_once_per_pair: bool = False,
) -> DataFrame:
    """streaming docs(doc_id, ts, text) → (doc_a, doc_b, hamming)
    near-dup pairs within the watermark horizon. The input must carry
    a watermark on ts (drives late-drop and the bucket timeout).
    `capped_acc`: optional SparkContext accumulator incremented once
    per bucket-batch that hit the star cap (audit).
    `emit_once_per_pair`: suppress per-band duplicate emissions (a pair
    is emitted only by its lowest agreeing band's bucket) — the
    DISTINCT pair set is unchanged but the sink traffic drops by the
    band-agreement factor. Only valid when `max_bucket_size` cannot be
    reached by any bucket (pass it ≥ the stream's doc volume): a
    capped bucket emits representative pairs only, and suppression in
    an uncapped bucket could then lose a pair whose canonical bucket
    was capped."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole recall "
            f"bound of n_bands-1={n_bands - 1}; raise n_bands"
        )
    if SIMHASH_BITS % n_bands:
        raise ValueError(f"n_bands must divide {SIMHASH_BITS}")
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    sk = docs.select(
        "doc_id", "ts", simhash32_md5_pandas(F.col("text")).alias("sim")
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
        _pair_fn(max_hamming, delay_sec, max_bucket_size, capped_acc,
                 n_bands=n_bands, emit_once_per_pair=emit_once_per_pair),
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
    emit_once_per_pair: bool = False,
) -> int:
    """AvailableNow job: catch up on unseen document files, append
    newly discovered near-dup pairs, stop. Resumable: bucket state
    (in-horizon simhashes) lives in the checkpoint across runs.
    Returns the number of bucket-batches that hit the star cap this
    run (also logged — the no-silent-caps audit).
    `emit_once_per_pair`: see neardup_pairs_stream (requires an
    unreachable max_bucket_size)."""
    import logging  # noqa: PLC0415

    capped_acc = spark.sparkContext.accumulator(0)
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", delay)
    )
    q = (
        neardup_pairs_stream(
            stream, max_hamming, n_bands, delay_sec, max_bucket_size,
            capped_acc=capped_acc, emit_once_per_pair=emit_once_per_pair,
        )
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    n_capped = capped_acc.value
    logger = logging.getLogger("portuguese_pt_legal_ner_spark.streaming")
    if n_capped:
        logger.warning(
            "stream_neardup_pairs: %d bucket-batches exceeded "
            "max_bucket_size=%d; new docs verified against bucket "
            "representatives only (streaming star-link)",
            n_capped, max_bucket_size,
        )
    else:
        logger.info(
            "stream_neardup_pairs: no bucket exceeded max_bucket_size=%d",
            max_bucket_size,
        )
    return n_capped
