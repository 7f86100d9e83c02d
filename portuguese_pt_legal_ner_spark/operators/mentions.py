"""Distributed mention detection — the engine's heavy scalar stage.

Re-expresses the reference's serial per-paragraph loop
(``process_document``/``_extract_entities``, src/inference.py:98-216)
as ONE vectorized ``mapInPandas`` stage over the transcripts table:

  transcripts(conv_id, turn_idx, role, text, tool, ts)
    → mentions(conv_id, turn_idx, para_idx, start, end, label,
               surface, score)

Design notes (scale-first):
  * ``mapInPandas`` iterator form: Arrow ships batches; the model (a
    per-executor-python-worker singleton in the real-checkpoint case)
    sees one pandas batch at a time — a partition never materializes
    whole. Mirrors the reference's batched-tokenization tactic
    (src/data.py:275-281) at cluster width.
  * 1 turn row → N mention rows: a UDTF shape, natural in mapInPandas.
  * the paragraph flatMap (src/inference.py:171-183) happens inside
    the UDF — no separate explode/shuffle; narrow stage end-to-end.
    Scan → mentions is shuffle-free; Catalyst prunes the scan to the
    3 needed columns (conv_id, turn_idx, text).
  * per-paragraph error guard (src/inference.py:214-216) is inside
    extract_entities_scored; per-TURN isolation here keeps a poisoned
    row from failing its whole partition.
  * decode/threshold/bounds semantics are imported from the shared
    modules — identical code to the serial oracle, so parity is
    structural.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..labels import DEFAULT_CONFIDENCE_THRESHOLD
from ..reference_path import extract_entities_scored, split_into_paragraphs

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("para_idx", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("label", T.StringType()),
        T.StructField("surface", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def detect_mentions(
    transcripts: DataFrame,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
) -> DataFrame:
    """transcripts → mentions via one Arrow-batched mapInPandas stage."""

    def process_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Real-model seam: load the executor-local model singleton here,
        # once per python worker (reference loads at inference.py:76-94).
        for batch in batches:
            out: dict[str, list] = {f.name: [] for f in MENTIONS_SCHEMA.fields}
            for conv_id, turn_idx, text in zip(
                batch["conv_id"], batch["turn_idx"], batch["text"]
            ):
                if text is None:
                    continue
                try:
                    for para_idx, para in enumerate(split_into_paragraphs(text)):
                        for start, end, label, score in extract_entities_scored(
                            para, confidence_threshold
                        ):
                            out["conv_id"].append(conv_id)
                            out["turn_idx"].append(turn_idx)
                            out["para_idx"].append(para_idx)
                            out["start"].append(start)
                            out["end"].append(end)
                            out["label"].append(label)
                            out["surface"].append(para[start:end])
                            out["score"].append(score)
                except Exception:
                    # per-turn isolation, reference per-paragraph guard
                    # analog (src/inference.py:214-216)
                    continue
            yield pd.DataFrame(out)

    pruned = transcripts.select("conv_id", "turn_idx", "text")
    return pruned.mapInPandas(process_batches, MENTIONS_SCHEMA)


def mentions_with_context(mentions: DataFrame, transcripts: DataFrame) -> DataFrame:
    """Re-attach role/tool/ts context to mentions for triple lifting.

    Equi-join on (conv_id, turn_idx); both sides are bucketable on
    conv_id so at scale this co-locates without a wide shuffle.
    """
    ctx = transcripts.select("conv_id", "turn_idx", "role", "tool", "ts")
    return mentions.join(ctx, ["conv_id", "turn_idx"], "left")
