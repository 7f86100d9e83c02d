"""BIO span decode compatible with HF ``aggregation_strategy="simple"``.

The reference builds ``pipeline("ner", ..., aggregation_strategy=
"simple")`` (src/inference.py:86-94) and consumes its entity dicts
``{entity_group, score, start, end}`` (src/inference.py:200-212).
This module reimplements that decode over (logits, char-offset) token
sequences so mock and real models share one exact decode path:

  * softmax per token, argmax label, probability = score;
  * "O" tokens close the current group;
  * a ``B-`` tag always starts a new group;
  * an ``I-`` tag continues the current group iff the entity type
    matches, else it starts a new group (HF's simple strategy treats
    a dangling I- as a group start);
  * group score = arithmetic mean of member token scores;
  * group char span = [first token start, last token end) — half-open,
    exactly the reference's output contract (src/inference.py:204-210).

Shared verbatim by the serial oracle (reference_path.py) and the Spark
mapInPandas detector (operators/mentions.py): parity between the two
paths is structural.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .labels import ID_TO_BIO, ID_TO_LABEL, split_bio  # noqa: F401 — split_bio/ID_TO_LABEL stay exported for callers
from .tokenization import Token


class EntitySpan(NamedTuple):
    start: int          # char offset, inclusive
    end: int            # char offset, exclusive
    entity_group: str   # entity type (no B-/I- prefix)
    score: float        # mean of member-token probabilities


def softmax(logits: np.ndarray) -> np.ndarray:
    # in-place temporaries: same operations in the same order as the
    # naive form (bit-identical results), ~half the memory traffic
    shifted = logits - logits.max(axis=-1, keepdims=True)
    np.exp(shifted, out=shifted)
    shifted /= shifted.sum(axis=-1, keepdims=True)
    return shifted


def decode_groups(
    tokens: list[Token], label_ids: list[int], scores: list[float]
) -> list[EntitySpan]:
    """The grouping core (argmax labels already taken): one shared
    implementation for the per-text and batched paths so scores are
    bit-identical between them (group score = sum/len mean)."""
    spans: list[EntitySpan] = []
    cur_type: str | None = None
    cur_scores: list[float] = []
    cur_start = 0
    cur_end = 0

    def flush() -> None:
        nonlocal cur_type, cur_scores
        if cur_type is not None:
            spans.append(
                EntitySpan(
                    cur_start, cur_end, cur_type,
                    sum(cur_scores) / len(cur_scores),
                )
            )
        cur_type = None
        cur_scores = []

    for tok, label_id, score in zip(tokens, label_ids, scores):
        prefix, etype = ID_TO_BIO[label_id]
        if prefix == "O":
            flush()
            continue
        if prefix == "B" or cur_type is None or etype != cur_type:
            flush()
            cur_type = etype
            cur_scores = [score]
            cur_start = tok.start
            cur_end = tok.end
        else:  # I- continuation of same type
            cur_scores.append(score)
            cur_end = tok.end
    flush()
    return spans


def decode_simple(tokens: list[Token], logits: np.ndarray) -> list[EntitySpan]:
    """Group per-token argmax predictions into entity spans."""
    if not tokens:
        return []
    probs = softmax(np.asarray(logits, dtype=np.float64))
    ids = probs.argmax(axis=-1)
    scores = probs[np.arange(len(tokens)), ids]
    return decode_groups(tokens, ids.tolist(), scores.tolist())
