"""Text analysis ops for a training-data pipeline over `documents`.

All pure column expressions (JVM-side, no UDFs): language-ID
(stopword-hit heuristic), quality scoring (length / punctuation /
stopword / repetition ratios), token counting (whitespace + a
BPE-ish subword regex estimate), and document fingerprinting
(min-hash winnowing over word 5-grams, md5-based so a DuckDB oracle
can reproduce it bit-for-bit — engine-native hash functions differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col, word_ngrams

# tiny per-language stopword gazetteers (heuristic lang-id)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "nicht", "ein", "ist", "zu"),
    "pt": ("o", "a", "de", "que", "e", "do", "da", "em"),
}


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds (lang_pred, lang_score): argmax of per-language stopword
    hit ratios, alphabetical tie-break, 'und' when nothing hits."""
    toks = tokens_col(F.col(text_col))
    scores = F.array(
        *[
            F.struct(
                (_stopword_hits(toks, ws).cast("double") / F.greatest(F.size(toks), F.lit(1))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_max(scores)  # struct compare: score first, then lang
    return docs.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_score", F.round(best["score"], 6))


def quality_score_col(text: Column) -> Column:
    """The composite [0,1] quality score as a reusable column
    expression (engine-neutral arithmetic — a DuckDB oracle reproduces
    it term-for-term): reward lexical diversity + sane token lengths,
    penalize punctuation soup; clamped to [0, 1]."""
    toks = tokens_col(text)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!?]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    mean_tok_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tokens
    )
    return F.least(
        F.greatest(
            0.5 * distinct_ratio
            + 0.3 * F.least(mean_tok_len / 8.0, F.lit(1.0))
            + 0.2 * (1.0 - punct.cast("double") / n_chars),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite [0,1] quality_score:
    the filters a pretraining corpus pipeline applies before training."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!?]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    mean_tok_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tokens
    )
    stop_ratio = (
        _stopword_hits(toks, LANG_STOPWORDS["en"]).cast("double") / n_tokens
    )
    score = quality_score_col(text)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate: count of
    alternating alpha/digit/punct runs (≈ GPT-style pre-tokenizer
    pieces), both as JVM-side expressions."""
    text = F.col(text_col)
    ws = F.size(tokens_col(text)).cast("long")
    # subword-ish pieces: runs of letters, digits, or single symbols
    pieces = F.size(
        F.filter(
            F.split(text, r"(?<=[a-zA-Z])(?=[^a-zA-Z\s])|(?<=[^a-zA-Z\s])(?=[a-zA-Z])|\s+"),
            lambda p: F.length(p) > 0,
        )
    ).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        pieces.alias("n_subword_pieces"),
        (F.length(text).cast("double") / F.greatest(ws, F.lit(1))).alias(
            "chars_per_token"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", ngram: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint: lexicographic min of
    md5(word-5-gram). md5 (not xxhash64) so DuckDB oracles reproduce
    it exactly; collision-irrelevant for dedup candidate use."""
    grams = word_ngrams(F.col(text_col), ngram)
    return docs.select(
        "doc_id",
        F.array_min(F.transform(grams, lambda g: F.md5(g))).alias("fingerprint"),
    )
