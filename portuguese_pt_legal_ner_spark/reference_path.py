"""Serial, faithful reimplementation of the reference inference loop.

This is the PARITY ORACLE: a single-process Python re-expression of
the reference's ``InferenceEngine.process_document`` /
``_extract_entities`` semantics (src/inference.py:98-216), run over
the shared deterministic mock model. The Spark path
(operators/mentions.py) must reproduce its output at P/R ≥ 0.95
(target 1.0) under stable (conv_id, turn_idx) ordering — the
BASELINE.md gate.

Faithfully mirrored reference behaviors:
  * paragraph split: ``[p.strip() for p in text.split("\\n") if
    p.strip()]`` (src/inference.py:171-183)                     [T1/T2]
  * confidence filter ``score >= threshold`` (inference.py:203) [T3]
  * bounds check ``0 <= start < end <= len(text)``
    (inference.py:209)                                          [T4]
  * span projection to ``[start, end, LABEL]`` (inference.py:210) [T5]
  * per-paragraph error guard → empty label list
    (inference.py:214-216)                                      [T6]
  * paragraphs kept even with zero entities (inference.py:124-127)
"""

from __future__ import annotations

from typing import Any

from .decode import decode_simple
from .labels import DEFAULT_CONFIDENCE_THRESHOLD
from .mock_model import score_tokens
from .tokenization import MAX_SEQ_LENGTH, tokenize_with_offsets


def split_into_paragraphs(text: str) -> list[str]:
    """Reference _split_into_paragraphs (src/inference.py:171-183)."""
    return [p.strip() for p in text.split("\n") if p.strip()]


def extract_entities_scored(
    text: str, confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
) -> list[tuple[int, int, str, float]]:
    """Reference _extract_entities (src/inference.py:185-216) over the
    mock model: decode → threshold → bounds check, keeping the score."""
    try:
        tokens = tokenize_with_offsets(text, MAX_SEQ_LENGTH)
        spans = decode_simple(tokens, score_tokens(tokens))
        result = []
        for span in spans:
            if span.score >= confidence_threshold:
                if 0 <= span.start < span.end <= len(text):
                    result.append(
                        (span.start, span.end, span.entity_group, span.score)
                    )
        return result
    except Exception:
        return []


def extract_entities_scored_batch(
    texts: list[str], confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
) -> list[list[tuple[int, int, str, float]]]:
    """Batched variant: ONE softmax/argmax over the concatenated logits
    of all texts (the real-model batching tactic, reference
    src/data.py:275-281), then per-text grouping on slices. Output is
    identical to extract_entities_scored per text — softmax is row-wise
    and the grouping core (decode.decode_groups) is shared — but numpy
    dispatch/allocation is amortized across the batch, which matters at
    high core counts where allocator/bandwidth pressure breaks scaling."""
    import numpy as np  # noqa: PLC0415

    from .decode import decode_groups, softmax  # noqa: PLC0415

    from .mock_model import score_token_batches  # noqa: PLC0415

    tokenized: list[list] = []
    for text in texts:
        try:
            tokenized.append(tokenize_with_offsets(text, MAX_SEQ_LENGTH))
        except Exception:
            tokenized.append([])
    nonempty = [toks for toks in tokenized if toks]
    if nonempty:
        stacked = score_token_batches(nonempty)
        probs = softmax(stacked.astype(np.float64))
        all_ids = probs.argmax(axis=-1)
        all_scores = probs[np.arange(len(all_ids)), all_ids]
        ids_list = all_ids.tolist()
        scores_list = all_scores.tolist()

    results: list[list[tuple[int, int, str, float]]] = []
    offset = 0
    for text, toks in zip(texts, tokenized):
        if not toks:
            results.append([])
            continue
        n = len(toks)
        ids = ids_list[offset : offset + n]
        scores = scores_list[offset : offset + n]
        offset += n
        try:
            out = []
            for span in decode_groups(toks, ids, scores):
                if (
                    span.score >= confidence_threshold
                    and 0 <= span.start < span.end <= len(text)
                ):
                    out.append((span.start, span.end, span.entity_group, span.score))
            results.append(out)
        except Exception:
            results.append([])
    return results


def extract_entities(
    text: str, confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
) -> list[list]:
    """Span projection to ``[start, end, LABEL]`` — the reference's
    exact output shape (src/inference.py:210), score dropped."""
    return [
        [s, e, label]
        for s, e, label, _ in extract_entities_scored(text, confidence_threshold)
    ]


def process_document(
    text: str, confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
) -> list[dict[str, Any]]:
    """Reference process_document (src/inference.py:98-129): one
    ``{"text": paragraph, "labels": [[s, e, L], ...]}`` record per
    non-empty paragraph, paragraphs without entities included."""
    results = []
    for paragraph in split_into_paragraphs(text):
        if not paragraph.strip():
            continue
        entities = extract_entities(paragraph, confidence_threshold)
        results.append({"text": paragraph, "labels": entities})
    return results


def mentions_for_turn(
    conv_id: str,
    turn_idx: int,
    text: str,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
) -> list[dict[str, Any]]:
    """Flatten process_document output into mention rows keyed by
    (conv_id, turn_idx, para_idx); start/end stay paragraph-relative,
    exactly the reference's JSONL span convention
    (src/inference.py:110-115)."""
    rows = []
    for para_idx, para_text in enumerate(split_into_paragraphs(text)):
        for start, end, label, score in extract_entities_scored(
            para_text, confidence_threshold
        ):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "para_idx": para_idx,
                    "start": start,
                    "end": end,
                    "label": label,
                    "surface": para_text[start:end],
                    "score": score,
                }
            )
    return rows
