"""Multi-subword detector backend, end-to-end through the Spark
detector (round-2 verdict item 7): a fake subword tokenizer emitting
multi-piece tokens + per-subword logits must produce the SAME mention
rows as the word-level path once decoded with HF first-subword
"simple" aggregation semantics (ref src/data.py:188-203,
src/inference.py:86-94) — making a real BERTimbau swap a one-seam
config change instead of untested territory."""

from __future__ import annotations

import pytest

from portuguese_pt_legal_ner_spark.operators.mentions import detect_mentions
from portuguese_pt_legal_ner_spark.reference_path import (
    extract_entities_scored_batch,
)
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts
from portuguese_pt_legal_ner_spark.subword_mock import (
    extract_entities_scored_batch_subword,
    subword_tokenize_with_offsets,
)

TEXTS = [
    "João Silva trabalha no Tribunal de Justiça de Lisboa",
    "processo número 1234/2021 em 12/02/1990 contacto maria@exemplo.pt",
    "Maria Santos mora em Coimbra CEP 1000-001 matrícula AB-12-34",
    "Rui Duvidoso esteve em Faro",  # sub-threshold entities
    "",
]


def test_subword_tokenizer_really_splits():
    pieces = subword_tokenize_with_offsets("Tribunal de Justiça")
    assert len(pieces) > 3  # "Tribunal" alone is 3 pieces
    # offsets tile the source words exactly
    assert pieces[0].text == "Tri" and (pieces[0].start, pieces[0].end) == (0, 3)
    joined = "".join(p.text for p in pieces)
    assert joined == "TribunaldeJustiça"


def test_batch_subword_equals_word_level():
    word = extract_entities_scored_batch(TEXTS)
    piece = extract_entities_scored_batch_subword(TEXTS)
    assert len(word) == len(piece)
    for w_spans, p_spans in zip(word, piece):
        assert [(s, e, t) for s, e, t, _ in w_spans] == [
            (s, e, t) for s, e, t, _ in p_spans
        ]
        # scores: same per-token values averaged over different counts
        # → equal to float noise
        for (_, _, _, ws), (_, _, _, ps) in zip(w_spans, p_spans):
            assert ws == pytest.approx(ps, abs=1e-9)


def test_detect_mentions_subword_backend_end_to_end(spark):
    """The full mapInPandas detector with the subword backend: same
    rows as the word-level default, through real Arrow batches and
    executor python workers."""
    t = synthetic_transcripts(spark, n_conversations=40, seed=42)

    def rows(df):
        return sorted(
            (
                r["conv_id"], r["turn_idx"], r["para_idx"], r["start"],
                r["end"], r["label"], r["surface"], round(r["score"], 6),
            )
            for r in df.collect()
        )

    base = rows(detect_mentions(t))
    sub = rows(
        detect_mentions(t, extractor=extract_entities_scored_batch_subword)
    )
    assert base and sub == base


def test_flops_hook_does_not_change_outputs(monkeypatch):
    """SPARK_GRAFT_MODEL_FLOPS in the subword scorer (round-3 advice:
    the hook previously lived only in the word-path mock, so
    flops-mode bench runs through the subword extractor measured zero
    model cost) — simulated arithmetic must not perturb logits."""
    import numpy as np

    from portuguese_pt_legal_ner_spark.subword_mock import (
        _pieces_with_labels,
        score_piece_batches,
    )

    _, labels = _pieces_with_labels("João Silva mora em Lisboa", 512)
    base = score_piece_batches([labels])
    monkeypatch.setenv("SPARK_GRAFT_MODEL_FLOPS", "2")
    with_flops = score_piece_batches([labels])
    assert np.array_equal(base, with_flops)
