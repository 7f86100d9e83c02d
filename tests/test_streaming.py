"""Structured Streaming incremental tests: exactly-once catch-up over
a growing transcripts directory, equivalence with the batch path."""

from __future__ import annotations

import os

from portuguese_pt_legal_ner_spark.operators.mentions import detect_mentions
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts
from portuguese_pt_legal_ner_spark.streaming.incremental import (
    stream_mentions,
    stream_mentions_foreach_batch,
)


def _key(r):
    return (r["conv_id"], r["turn_idx"], r["para_idx"], r["start"], r["end"], r["label"])


def test_stream_catches_up_and_is_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckp = str(tmp_path / "ckp")

    t1 = synthetic_transcripts(spark, n_conversations=20, seed=1)
    t1.write.mode("append").parquet(inp)

    stream_mentions(spark, inp, out, ckp)
    got1 = {_key(r) for r in spark.read.parquet(out).collect()}
    want1 = {_key(r) for r in detect_mentions(t1).collect()}
    assert got1 == want1

    # second batch of files appears; rerun stream — only new files
    # are processed (exactly-once), outputs accumulate
    t2 = synthetic_transcripts(spark, n_conversations=20, seed=2)
    t2 = t2.selectExpr(
        "concat('b2_', conv_id) as conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    t2.write.mode("append").parquet(inp)

    stream_mentions(spark, inp, out, ckp)
    got2 = {_key(r) for r in spark.read.parquet(out).collect()}
    want2 = want1 | {_key(r) for r in detect_mentions(t2).collect()}
    assert got2 == want2

    # idempotence: rerunning with nothing new appends nothing
    stream_mentions(spark, inp, out, ckp)
    got3 = {_key(r) for r in spark.read.parquet(out).collect()}
    assert got3 == got2


def test_foreach_batch_receives_microbatches(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckp = str(tmp_path / "ckp")
    synthetic_transcripts(spark, n_conversations=10, seed=3).write.mode(
        "append"
    ).parquet(inp)

    seen = []

    def batch_fn(df, batch_id):
        seen.append((batch_id, df.count()))

    stream_mentions_foreach_batch(spark, inp, ckp, batch_fn)
    assert seen and sum(n for _, n in seen) > 0
