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


from functools import lru_cache


@lru_cache(maxsize=4096)
def _argmax_id_prob(label_id: int, rule_score: float) -> tuple[int, float]:
    """(argmax id, softmax probability at it) for a mock-model logits
    row, memoized by (rule label, rule score).

    A mock logits row is one nonzero float32 logit at `label_id` (see
    mock_model.score_tokens), and every softmax/argmax op is row-local
    (max/exp/sum/divide along axis -1), so both outputs are pure
    functions of (label_id, rule_score). The memo RUNS the identical
    numpy ops on a single row — same argmax tie-breaking, bit-identical
    float — pinned against the logits path in test_parity_mentions.
    Rule scores come from a ~20-value fixed set, so the cache is
    effectively total."""
    import numpy as np  # noqa: PLC0415

    from .decode import softmax  # noqa: PLC0415
    from .labels import NUM_LABELS  # noqa: PLC0415
    from .mock_model import _logit_for_score  # noqa: PLC0415

    row = np.zeros((1, NUM_LABELS), dtype=np.float32)
    row[0, label_id] = _logit_for_score(rule_score)
    probs = softmax(row.astype(np.float64))
    arg = int(probs.argmax(axis=-1)[0])
    return arg, float(probs[0, arg])


def extract_entities_scored_batch(
    texts: list[str], confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
) -> list[list[tuple[int, int, str, float]]]:
    """Batched variant: output identical to extract_entities_scored per
    text (the grouping core decode.decode_groups is shared and the
    per-token probability is the memoized bit-exact _argmax_prob).

    The stacked logits → softmax → argmax round-trip (the real-model
    batching tactic, reference src/data.py:275-281) only re-derives,
    per token, a value that is a function of the rule (label, score) —
    the memo skips the [total_tokens, 19] float64 matrix entirely.
    With SPARK_GRAFT_MODEL_FLOPS set (bench realism mode) the full
    logits path runs instead, so the forward-pass flops simulation
    stays inside the model seam where it belongs."""
    import os  # noqa: PLC0415

    from .decode import decode_groups  # noqa: PLC0415
    from .labels import LABEL_TO_ID  # noqa: PLC0415
    from .mock_model import classify_tokens  # noqa: PLC0415

    if os.environ.get("SPARK_GRAFT_MODEL_FLOPS"):
        return _extract_entities_scored_batch_logits(
            texts, confidence_threshold
        )

    results: list[list[tuple[int, int, str, float]]] = []
    for text in texts:
        try:
            toks = tokenize_with_offsets(text, MAX_SEQ_LENGTH)
        except Exception:
            results.append([])
            continue
        if not toks:
            results.append([])
            continue
        labeled = classify_tokens(toks)
        pairs = [
            _argmax_id_prob(LABEL_TO_ID[label], s) for label, s in labeled
        ]
        ids = [p[0] for p in pairs]
        scores = [p[1] for p in pairs]
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


def _extract_entities_scored_batch_logits(
    texts: list[str], confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
) -> list[list[tuple[int, int, str, float]]]:
    """The stacked-logits form of the batch extractor: ONE
    softmax/argmax over the concatenated logits of all texts, then
    per-text grouping on slices. This is the model-interface path a
    real checkpoint exercises (and the SPARK_GRAFT_MODEL_FLOPS
    realism-mode path); the memoized fast path above is pinned
    bit-identical to it."""
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
