"""Unit tests for the BIO "simple"-aggregation decode and the serial
reference path — covering the edge cases SURVEY.md §5 calls out:
B/I continuation, I-without-B, label switches, O breaks, threshold
and bounds filters, paragraph split semantics."""

from __future__ import annotations

import numpy as np

from portuguese_pt_legal_ner_spark.decode import decode_simple
from portuguese_pt_legal_ner_spark.labels import (
    ENTITY_LABELS,
    LABEL_TO_ID,
    NUM_LABELS,
)
from portuguese_pt_legal_ner_spark.mock_model import score_tokens
from portuguese_pt_legal_ner_spark.reference_path import (
    extract_entities,
    process_document,
    split_into_paragraphs,
)
from portuguese_pt_legal_ner_spark.tokenization import Token, tokenize_with_offsets


def _logits_for(labels: list[str], strength: float = 8.0) -> np.ndarray:
    out = np.zeros((len(labels), NUM_LABELS), dtype=np.float32)
    for i, label in enumerate(labels):
        out[i, LABEL_TO_ID[label]] = strength
    return out


def _toks(words: list[str]) -> list[Token]:
    toks, pos = [], 0
    for w in words:
        toks.append(Token(w, pos, pos + len(w)))
        pos += len(w) + 1
    return toks


def test_label_space():
    assert NUM_LABELS == 19
    assert ENTITY_LABELS[0] == "O"
    assert "B-E-MAIL" in ENTITY_LABELS and "I-E-MAIL" in ENTITY_LABELS


def test_b_i_continuation_merges():
    toks = _toks(["João", "Silva"])
    spans = decode_simple(toks, _logits_for(["B-PER", "I-PER"]))
    assert len(spans) == 1
    assert (spans[0].start, spans[0].end, spans[0].entity_group) == (0, 10, "PER")


def test_i_without_b_starts_group():
    toks = _toks(["Silva", "e", "Santos"])
    spans = decode_simple(toks, _logits_for(["I-PER", "O", "I-PER"]))
    assert [(s.start, s.end, s.entity_group) for s in spans] == [
        (0, 5, "PER"),
        (8, 14, "PER"),
    ]


def test_adjacent_b_b_splits():
    toks = _toks(["Lisboa", "Porto"])
    spans = decode_simple(toks, _logits_for(["B-LOC", "B-LOC"]))
    assert len(spans) == 2


def test_type_switch_inside_i_splits():
    toks = _toks(["Lisboa", "Silva"])
    spans = decode_simple(toks, _logits_for(["B-LOC", "I-PER"]))
    assert [(s.entity_group,) for s in spans] == [("LOC",), ("PER",)]


def test_o_breaks_group():
    toks = _toks(["João", "foi", "Silva"])
    spans = decode_simple(toks, _logits_for(["B-PER", "O", "I-PER"]))
    assert len(spans) == 2


def test_group_score_is_mean():
    toks = _toks(["a", "b"])
    logits = np.zeros((2, NUM_LABELS), dtype=np.float64)
    logits[0, LABEL_TO_ID["B-PER"]] = 50.0   # prob ~1.0
    logits[1, LABEL_TO_ID["I-PER"]] = 0.0    # uniform -> prob 1/19
    spans = decode_simple(toks, logits)
    # second token argmax is ambiguous at uniform logits; force distinct:
    logits[1, LABEL_TO_ID["I-PER"]] = 0.1
    spans = decode_simple(toks, logits)
    assert len(spans) == 1
    expected = (1.0 + np.exp(0.1) / (np.exp(0.1) + 18)) / 2
    assert abs(spans[0].score - expected) < 1e-6


def test_empty_input():
    assert decode_simple([], np.zeros((0, NUM_LABELS))) == []


def test_paragraph_split_reference_semantics():
    # src/inference.py:171-183 — strip, drop empties
    assert split_into_paragraphs("a\n\n  \nb \n") == ["a", "b"]
    assert split_into_paragraphs("") == []
    assert split_into_paragraphs("   \n  ") == []


def test_confidence_threshold_filters_subthreshold():
    # 'Rui Duvidoso' (0.42) and 'Faro' (0.44) are below the reference's
    # 0.5 default (src/config.py:63, applied src/inference.py:203)
    assert extract_entities("Rui Duvidoso esteve em Faro.") == []
    # and visible at a lower threshold
    got = extract_entities("Rui Duvidoso esteve em Faro.", confidence_threshold=0.3)
    assert [g[2] for g in got] == ["PER", "LOC"]


def test_worked_example_consistency():
    text = "O réu João Silva foi notificado em Lisboa, em 12/02/1990."
    got = extract_entities(text)
    assert [(text[s:e], label) for s, e, label in got] == [
        ("João Silva", "PER"),
        ("Lisboa", "LOC"),
        ("12/02/1990", "DAT"),
    ]
    # spans are valid half-open char offsets (bounds check inference.py:209)
    for s, e, _ in got:
        assert 0 <= s < e <= len(text)


def test_process_document_keeps_entityless_paragraphs():
    # src/inference.py:124-127 — paragraphs without entities included
    results = process_document("sem entidades aqui\nJoão Silva em Lisboa")
    assert len(results) == 2
    assert results[0]["labels"] == []
    assert len(results[1]["labels"]) == 2


def test_longest_gazetteer_match_wins():
    text = "O Tribunal de Justiça de Lisboa reuniu."
    got = extract_entities(text)
    assert [text[s:e] for s, e, _ in got] == ["Tribunal de Justiça de Lisboa"]


def test_all_nine_types_detectable():
    text = (
        "João Silva do Tribunal de Justiça em Lisboa a 12/02/1990, "
        "processo número 12345/2023, tel +351 912 345 678, "
        "email maria@exemplo.pt, morada 1000-001, viatura AB-12-34."
    )
    labels = {label for _, _, label in extract_entities(text)}
    assert labels == {"PER", "ORG", "LOC", "DAT", "IDP", "TEL", "E-MAIL", "CEP", "MAT"}


def test_mock_logits_interface():
    toks = tokenize_with_offsets("João Silva em Lisboa")
    logits = score_tokens(toks)
    assert logits.shape == (len(toks), NUM_LABELS)
