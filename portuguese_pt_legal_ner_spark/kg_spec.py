"""The triple-lifting specification — shared by Spark and oracle paths.

The reference emits entities only (src/inference.py:210); triples are
the north-star's extension. This module is the single source of truth
for the rules so the Spark implementation (operators/triples.py) and
the serial oracle (oracle_kg.py) cannot drift:

  R1 (role gate)  : turns with role='system' yield no triples.
  R2 (subject)    : within a paragraph, the earliest mention (by char
                    start) whose label is PER or ORG is the paragraph
                    subject.
  R3 (inheritance): a paragraph with no PER/ORG mention inherits the
                    most recent paragraph subject earlier in the same
                    conversation (ordered by (turn_idx, para_idx)) —
                    the conv_id window the north_star mandates.
  R4 (objects)    : every mention in the paragraph other than the
                    subject mention itself becomes an object; the
                    predicate is PREDICATES[(subj_label, obj_label)].
  R5 (evidence)   : each triple carries (role, tool, conv_id,
                    turn_idx, para_idx) provenance.
  R6 (ordering)   : output contract is stable (conv_id, turn_idx,
                    para_idx, obj_start) ordering.
"""

from __future__ import annotations

SUBJECT_LABELS = ("PER", "ORG")

PREDICATES: dict[tuple[str, str], str] = {
    ("PER", "PER"): "associated_with",
    ("PER", "ORG"): "involved_with",
    ("PER", "LOC"): "located_in",
    ("PER", "DAT"): "on_date",
    ("PER", "IDP"): "party_in",
    ("PER", "TEL"): "has_phone",
    ("PER", "E-MAIL"): "has_email",
    ("PER", "CEP"): "has_postal_code",
    ("PER", "MAT"): "owns_vehicle",
    ("ORG", "PER"): "involves",
    ("ORG", "ORG"): "associated_with",
    ("ORG", "LOC"): "located_in",
    ("ORG", "DAT"): "on_date",
    ("ORG", "IDP"): "handles_case",
    ("ORG", "TEL"): "has_phone",
    ("ORG", "E-MAIL"): "has_email",
    ("ORG", "CEP"): "has_postal_code",
    ("ORG", "MAT"): "owns_vehicle",
}

EXCLUDED_ROLES = ("system",)
