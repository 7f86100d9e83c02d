"""CoNLL source (SURVEY §2.1 S1) + train/test split (A7).

The reference parses token\\tlabel lines with blank-line sentence
boundaries, tolerates >2 columns, and silently skips malformed lines
(src/data.py:53-95; format documented README.md:182-199). Used for
fixtures and metric-math tests only — the inference path reads the
transcripts table.

Distributed shape: one whole file per row (``spark.read.text(...,
wholetext=True)``) → mapInPandas stateful chunker that splits files
into sentences. Sentence boundaries never cross files, so this is
embarrassingly parallel across files; a single multi-GB CoNLL file
would instead need a custom input format — out of scope (training
fixtures are many small files).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONLL_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("sentence_idx", T.IntegerType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("labels", T.ArrayType(T.StringType())),
    ]
)


def parse_conll_text(text: str) -> list[tuple[list[str], list[str]]]:
    """Reference read_conll_file semantics (src/data.py:53-95):
    \\t-split, ≥2 fields required (extra fields ignored), blank line
    ends a sentence, malformed lines skipped silently."""
    sentences: list[tuple[list[str], list[str]]] = []
    tokens: list[str] = []
    labels: list[str] = []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            if tokens:
                sentences.append((tokens, labels))
                tokens, labels = [], []
            continue
        parts = line.split("\t")
        if len(parts) >= 2:
            tokens.append(parts[0])
            labels.append(parts[1])
    if tokens:
        sentences.append((tokens, labels))
    return sentences


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of CoNLL files → (file, sentence_idx, tokens,
    labels) rows."""
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"file": [], "sentence_idx": [], "tokens": [], "labels": []}
            for fname, text in zip(batch["file"], batch["value"]):
                for idx, (toks, labs) in enumerate(parse_conll_text(text)):
                    out["file"].append(fname)
                    out["sentence_idx"].append(idx)
                    out["tokens"].append(toks)
                    out["labels"].append(labs)
            yield pd.DataFrame(out)

    return files.mapInPandas(chunk, CONLL_SCHEMA)


def train_test_split(
    df: DataFrame, test_size: float = 0.1, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Reference train_test_split(test_size=0.1, seed) (src/cli.py:254)
    → randomSplit; Spark's split is per-row Bernoulli, the same
    contract sklearn's shuffle-split approximates at scale."""
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test
