"""Subword-alignment property test (round-1 verdict item 9; pre-work
for a real BERTimbau checkpoint).

A real HF fast tokenizer splits words into subword pieces; a fine-tuned
token-classification head predicts the word's label on the FIRST
subword (training masks continuations with -100, ref
src/data.py:188-203) and, in practice, I-<type> on continuation pieces
inside an entity. HF's ``aggregation_strategy="simple"`` then groups at
the token-piece level using char offsets.

Contract pinned here: feeding decode_groups a multi-subword piece
stream labeled by that convention yields exactly the spans of the
word-level stream — so swapping the word-level mock tokenizer for a
real subword tokenizer changes nothing downstream of the logits.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from portuguese_pt_legal_ner_spark.decode import decode_groups
from portuguese_pt_legal_ner_spark.labels import ENTITY_TYPES, LABEL_TO_ID
from portuguese_pt_legal_ner_spark.tokenization import Token

# a word is (length, bio_label); hypothesis builds sentences of them
_word = st.tuples(
    st.integers(min_value=1, max_value=9),              # word length
    st.sampled_from(
        ["O"]
        + [f"{p}-{t}" for p in ("B", "I") for t in ENTITY_TYPES[:4]]
    ),
)
_splits = st.integers(min_value=1, max_value=4)          # subwords per word


def _build_streams(words, split_counts):
    """word stream + the equivalent first-subword-labeled piece stream."""
    word_tokens, word_labels = [], []
    piece_tokens, piece_labels = [], []
    pos = 0
    for (length, label), n_pieces in zip(words, split_counts):
        start, end = pos, pos + length
        word_tokens.append(Token("w" * length, start, end))
        word_labels.append(label)
        # split [start, end) into n_pieces contiguous non-empty chunks
        n_pieces = min(n_pieces, length)
        bounds = [start + (length * i) // n_pieces for i in range(n_pieces)] + [end]
        etype = label.partition("-")[2]
        for i in range(n_pieces):
            piece_tokens.append(Token("p", bounds[i], bounds[i + 1]))
            if i == 0:
                piece_labels.append(label)
            else:
                # continuation piece: I-<type> inside an entity, else O
                piece_labels.append(f"I-{etype}" if label != "O" else "O")
        pos = end + 1  # single space between words
    return word_tokens, word_labels, piece_tokens, piece_labels


@settings(max_examples=300, deadline=None)
@given(st.lists(_word, min_size=1, max_size=12), st.data())
def test_subword_stream_decodes_to_word_spans(words, data):
    split_counts = [data.draw(_splits) for _ in words]
    wt, wl, pt, pl = _build_streams(words, split_counts)

    def spans(tokens, labels):
        ids = [LABEL_TO_ID[x] for x in labels]
        return [
            (s.start, s.end, s.entity_group)
            for s in decode_groups(tokens, ids, [1.0] * len(ids))
        ]

    assert spans(pt, pl) == spans(wt, wl)


def test_known_multi_subword_example():
    """'João Silva' as Jo/##ão Sil/##va: B-PER I-PER I-PER I-PER →
    one PER span covering both words (HF simple semantics)."""
    pieces = [Token("Jo", 0, 2), Token("ão", 2, 4),
              Token("Sil", 5, 8), Token("va", 8, 10)]
    labels = ["B-PER", "I-PER", "I-PER", "I-PER"]
    ids = [LABEL_TO_ID[x] for x in labels]
    spans = decode_groups(pieces, ids, [1.0] * 4)
    assert [(s.start, s.end, s.entity_group) for s in spans] == [(0, 10, "PER")]
