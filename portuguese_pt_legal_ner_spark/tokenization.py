"""Deterministic word-level tokenizer with character offsets.

The sandbox has no HF tokenizer weights, so the mock model operates on
a simple, fully deterministic tokenization: maximal runs of
word-characters (unicode letters/digits, plus a few in-token joiners
that the entity patterns need: '@' '.' '-' '+' '/' when glued to word
chars) or single punctuation marks. Offsets are half-open character
spans into the original string — the same contract HF fast tokenizers
expose via offset_mapping and that the reference's span output relies
on (src/inference.py:204-210: entity start/end are char offsets).

Shared verbatim by the serial reference-path oracle and the Spark
mapInPandas detector so span parity is structural, not statistical.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# A token is: a run of word chars possibly containing internal
# @ . - + / (so 'maria@exemplo.pt', '12/02/1990', '1000-001', 'AB-12-34',
# '+351' stay single tokens), OR any single non-space symbol.
_TOKEN_RE = re.compile(
    r"[+]?[\w](?:[\w@.\-/+]*[\w])?|[^\w\s]",
    re.UNICODE,
)


class Token(NamedTuple):
    text: str
    start: int  # char offset, inclusive
    end: int    # char offset, exclusive


def tokenize_with_offsets(text: str) -> list[Token]:
    """Tokenize `text` into Tokens with half-open char spans."""
    return [Token(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def simple_word_tokens(text: str) -> list[str]:
    """Just the token strings (for shingling / counting paths)."""
    return [t.text for t in tokenize_with_offsets(text)]
