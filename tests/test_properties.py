"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: the reference has no property tests).

Invariants under arbitrary inputs:
  * decode: spans are within bounds, non-overlapping, ordered, typed,
    and every span covers ≥1 non-O token;
  * decode is total (never raises) on arbitrary label sequences,
    including pathological I-without-B / alternating patterns;
  * tokenizer offsets are faithful slices;
  * paragraph split matches the reference's strip/filter semantics;
  * batched extract ≡ per-text extract on arbitrary text lists;
  * CoNLL parse round-trips well-formed sentences.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from portuguese_pt_legal_ner_spark.decode import decode_simple
from portuguese_pt_legal_ner_spark.labels import ENTITY_LABELS, LABEL_TO_ID, NUM_LABELS
from portuguese_pt_legal_ner_spark.reference_path import (
    extract_entities_scored,
    extract_entities_scored_batch,
    split_into_paragraphs,
)
from portuguese_pt_legal_ner_spark.sources.conll import parse_conll_text
from portuguese_pt_legal_ner_spark.tokenization import Token, tokenize_with_offsets

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
    ),
    max_size=300,
)

LABELS = st.lists(st.sampled_from(ENTITY_LABELS), min_size=0, max_size=40)


def _toks_for(labels: list[str]) -> list[Token]:
    toks, pos = [], 0
    for i in range(len(labels)):
        word = f"w{i}"
        toks.append(Token(word, pos, pos + len(word)))
        pos += len(word) + 1
    return toks


def _logits_for(labels: list[str]) -> np.ndarray:
    out = np.zeros((len(labels), NUM_LABELS), dtype=np.float32)
    for i, label in enumerate(labels):
        out[i, LABEL_TO_ID[label]] = 9.0
    return out


@given(LABELS)
@settings(max_examples=200, deadline=None)
def test_decode_invariants_on_arbitrary_bio_sequences(labels):
    toks = _toks_for(labels)
    spans = decode_simple(toks, _logits_for(labels))
    prev_end = -1
    for s in spans:
        assert s.start >= 0 and s.start < s.end
        assert s.start >= prev_end  # ordered, non-overlapping
        prev_end = s.end
        assert s.entity_group in {l.split("-", 1)[1] for l in ENTITY_LABELS if l != "O"}
        assert 0.0 < s.score <= 1.0
    # number of spans == number of group starts in the BIO sequence
    starts = 0
    prev_type = None
    for label in labels:
        if label == "O":
            prev_type = None
            continue
        prefix, etype = label.split("-", 1)
        if prefix == "B" or prev_type != etype:
            starts += 1
        prev_type = etype
    assert len(spans) == starts


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_tokenizer_offsets_are_faithful_slices(text):
    for tok in tokenize_with_offsets(text):
        assert text[tok.start : tok.end] == tok.text
        assert tok.text.strip() == tok.text and tok.text


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_paragraph_split_reference_semantics(text):
    paras = split_into_paragraphs(text)
    assert paras == [p.strip() for p in text.split("\n") if p.strip()]
    for p in paras:
        assert "\n" not in p and p == p.strip() and p


@given(TEXT)
@settings(max_examples=150, deadline=None)
def test_extract_is_total_and_spans_in_bounds(text):
    for start, end, label, score in extract_entities_scored(text):
        assert 0 <= start < end <= len(text)
        assert score >= 0.5


@given(st.lists(TEXT, max_size=12))
@settings(max_examples=60, deadline=None)
def test_batched_equals_per_text(texts):
    per = [extract_entities_scored(t) for t in texts]
    bat = extract_entities_scored_batch(texts)
    assert per == bat


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.text(
                    # exclude control chars: the reference's
                    # line.strip() treats \x1c-\x1f as whitespace
                    alphabet=st.characters(exclude_characters="\t\n\r ",
                                           exclude_categories=("Cs", "Zs", "Cc")),
                    min_size=1, max_size=8,
                ),
                st.sampled_from(ENTITY_LABELS),
            ),
            min_size=1, max_size=6,
        ),
        min_size=0, max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_conll_roundtrip(sentences):
    text = "\n\n".join(
        "\n".join(f"{tok}\t{label}" for tok, label in sent) for sent in sentences
    )
    parsed = parse_conll_text(text)
    want = [([t for t, _ in s], [l for _, l in s]) for s in sentences]
    assert parsed == want


PNG_CHANNELS = st.sampled_from([1, 2, 3, 4])


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    PNG_CHANNELS,
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
    st.randoms(use_true_random=False),
)
@settings(max_examples=80, deadline=None)
def test_png_decode_filter_invariance(w, h, ch, filters, rng):
    """The stdlib PNG decoder's unfiltering is correct for EVERY
    filter assignment: any per-scanline filter rotation over arbitrary
    pixels must decode to the same (dims, features) as the filter-0
    (identity) encoding of the same pixels — so each of the five
    reverse filters exactly inverts its forward transform."""
    from portuguese_pt_legal_ner_spark.operators.multimodal import png_decode
    from tests.test_textstats_similarity import _png_encode

    pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
    base = png_decode(_png_encode(pixels, w, h, ch, [0]))
    assert base[:2] == (w, h)
    assert png_decode(_png_encode(pixels, w, h, ch, filters)) == base
