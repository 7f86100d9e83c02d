"""The 19-label BIO space — the engine's core type system.

Semantics mirror the reference's label constants: 9 entity types, each
with B-/I- variants, plus O (reference: src/data.py:27-47, asserted as
"9 entities * 2 (B-, I-) + O" at src/config.py:36; documented with
examples at README.md:14-28). Values are plain Python constants —
broadcast to executors implicitly via closure capture; entity type is
a StringType column in every downstream table.
"""

from __future__ import annotations

ENTITY_TYPES: tuple[str, ...] = (
    "PER",      # people (parties, judges, lawyers)
    "ORG",      # organizations (courts, companies, ministries)
    "LOC",      # locations
    "DAT",      # dates
    "IDP",      # process / identity numbers
    "TEL",      # telephone numbers
    "E-MAIL",   # e-mail addresses
    "CEP",      # postal codes
    "MAT",      # license plates
)

ENTITY_LABELS: tuple[str, ...] = ("O",) + tuple(
    f"{prefix}-{etype}" for etype in ENTITY_TYPES for prefix in ("B", "I")
)

LABEL_TO_ID: dict[str, int] = {label: i for i, label in enumerate(ENTITY_LABELS)}
ID_TO_LABEL: dict[int, str] = {i: label for i, label in enumerate(ENTITY_LABELS)}

NUM_LABELS = len(ENTITY_LABELS)
assert NUM_LABELS == 19, "9 entity types * 2 (B-, I-) + O"

# Default confidence threshold, mirroring the reference's
# InferenceConfig.confidence_threshold default (src/config.py:63) and
# its use in _extract_entities (src/inference.py:203).
DEFAULT_CONFIDENCE_THRESHOLD = 0.5


def split_bio(label: str) -> tuple[str, str]:
    """Split a BIO label into (prefix, entity_type); O -> ("O", "")."""
    if label == "O" or not label:
        return "O", ""
    prefix, _, etype = label.partition("-")
    return prefix, etype


# id → (prefix, entity_type), precomputed once: the decode loop runs
# per token on the flagship path, and a tuple index replaces a dict
# lookup plus a string partition per token (identical values by
# construction — split_bio itself builds the table)
ID_TO_BIO: tuple[tuple[str, str], ...] = tuple(
    split_bio(label) for label in ENTITY_LABELS
)
