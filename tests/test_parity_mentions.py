"""The P/R ≥ 0.95 parity gate (BASELINE.md row 1): Spark mapInPandas
detector vs the serial reference-path oracle on identical synthetic
transcripts, under stable (conv_id, turn_idx) ordering, with per-turn
text equality between paths."""

from __future__ import annotations

from portuguese_pt_legal_ner_spark.operators.mentions import detect_mentions
from portuguese_pt_legal_ner_spark.reference_path import mentions_for_turn
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts
from portuguese_pt_legal_ner_spark.synth import generate_transcripts

N_CONV = 120
SEED = 42


def _key(row) -> tuple:
    return (
        row["conv_id"], row["turn_idx"], row["para_idx"],
        row["start"], row["end"], row["label"],
    )


def test_spark_matches_reference_oracle(spark):
    turns = generate_transcripts(n_conversations=N_CONV, seed=SEED)

    oracle_rows = []
    for turn in turns:
        oracle_rows.extend(
            mentions_for_turn(turn["conv_id"], turn["turn_idx"], turn["text"])
        )
    oracle = {_key(r) for r in oracle_rows}
    assert len(oracle) == len(oracle_rows), "oracle emitted duplicate spans"
    assert oracle, "oracle found no mentions — fixture broken"

    df = synthetic_transcripts(spark, n_conversations=N_CONV, seed=SEED, partitions=8)
    got_rows = [r.asDict() for r in detect_mentions(df).collect()]
    got = {_key(r) for r in got_rows}

    tp = len(oracle & got)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(oracle) if oracle else 0.0
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"
    # target is exact parity — shared decode means this should be 1.0
    assert precision == 1.0 and recall == 1.0

    # per-turn text-equality invariant: every surface equals the slice
    # of the paragraph text the span points into
    text_by_turn = {(t["conv_id"], t["turn_idx"]): t["text"] for t in turns}
    from portuguese_pt_legal_ner_spark.reference_path import split_into_paragraphs

    for row in got_rows:
        text = text_by_turn[(row["conv_id"], row["turn_idx"])]
        para = split_into_paragraphs(text)[row["para_idx"]]
        assert para[row["start"]:row["end"]] == row["surface"]


def test_detection_deterministic_across_parallelism(spark):
    """Same input, different partitioning → identical mention set
    (prerequisite for honest N-vs-4N scaling measurements)."""
    df2 = synthetic_transcripts(spark, n_conversations=40, seed=7, partitions=2)
    df16 = synthetic_transcripts(spark, n_conversations=40, seed=7, partitions=16)
    rows2 = {_key(r.asDict()) for r in detect_mentions(df2).collect()}
    rows16 = {_key(r.asDict()) for r in detect_mentions(df16).collect()}
    assert rows2 == rows16


def test_batch_fast_path_bit_identical_to_logits_path():
    """The memoized (label, score) → (argmax id, prob) fast path must
    be BIT-identical to the stacked logits → softmax → argmax model-
    interface path (same spans, same float scores) — the flagship
    detector's output may not depend on which path ran (round-7
    optimization guard)."""
    from portuguese_pt_legal_ner_spark.reference_path import (
        _extract_entities_scored_batch_logits,
        extract_entities_scored,
        extract_entities_scored_batch,
        split_into_paragraphs,
    )
    from portuguese_pt_legal_ner_spark.synth import generate_transcripts

    paras = []
    for r in generate_transcripts(n_conversations=300, seed=7):
        if r["text"]:
            paras.extend(split_into_paragraphs(r["text"]))
    assert len(paras) > 1000
    fast = extract_entities_scored_batch(paras, 0.5)
    logits = _extract_entities_scored_batch_logits(paras, 0.5)
    assert fast == logits
    serial = [extract_entities_scored(p, 0.5) for p in paras[:200]]
    assert fast[:200] == serial
    assert any(fast)  # non-vacuous
