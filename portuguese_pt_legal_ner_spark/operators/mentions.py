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
from ..reference_path import (
    extract_entities_scored_batch,
    split_into_paragraphs,
)

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
    passthrough: tuple[str, ...] = (),
    extractor=None,
    model_artifact: str | None = None,
) -> DataFrame:
    """transcripts → mentions via one Arrow-batched mapInPandas stage.

    `passthrough` columns (e.g. ("role", "tool")) are copied from the
    turn onto its mention rows INSIDE the UDF — the mention detector
    already scans every turn, so carrying context through it is free
    and replaces a whole (conv_id, turn_idx) equi-join + shuffle that
    re-attaching context downstream would cost.

    `extractor` is the model backend — any callable with
    extract_entities_scored_batch's (texts, threshold) → spans-per-text
    contract; the default is the shared word-level mock path, and
    subword_mock.extract_entities_scored_batch_subword drives the same
    plan through a multi-subword tokenizer + per-subword logits (the
    BERTimbau shape). Swapping a real checkpoint is a one-seam change.

    `model_artifact`: name of a ship_model_artifact()-distributed
    artifact dir (K5, ref src/models.py:177-211 / inference.py:65-94);
    the UDF resolves it via SparkFiles ONCE per python worker
    (executor singleton) and takes the confidence threshold from its
    config — the load path a real checkpoint swap uses.
    """
    schema = T.StructType(
        MENTIONS_SCHEMA.fields
        + [transcripts.schema[name] for name in passthrough]
    )
    base_cols = [f.name for f in MENTIONS_SCHEMA.fields]

    def process_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Executor-local model singleton, resolved once per python
        # worker (reference loads at inference.py:76-94)
        threshold = confidence_threshold
        if model_artifact is not None:
            from ..model_artifacts import load_shipped_artifact  # noqa: PLC0415

            threshold = load_shipped_artifact(
                model_artifact
            ).confidence_threshold
        extract = extractor or extract_entities_scored_batch
        for batch in batches:
            # phase 1: paragraph spine for the whole Arrow batch
            paras: list[str] = []
            meta: list[tuple] = []  # (conv_id, turn_idx, para_idx, *extras)
            extras = [batch[name] for name in passthrough]
            for conv_id, turn_idx, text, *extra_vals in zip(
                batch["conv_id"], batch["turn_idx"], batch["text"], *extras
            ):
                if text is None:
                    continue
                try:
                    for para_idx, para in enumerate(split_into_paragraphs(text)):
                        paras.append(para)
                        meta.append((conv_id, turn_idx, para_idx, *extra_vals))
                except Exception:
                    # per-turn isolation, reference per-paragraph guard
                    # analog (src/inference.py:214-216)
                    continue
            # phase 2: ONE batched model call + decode for all paragraphs
            all_spans = extract(paras, threshold)
            out: dict[str, list] = {name: [] for name in base_cols}
            for name in passthrough:
                out[name] = []
            for para, (conv_id, turn_idx, para_idx, *extra_vals), spans in zip(
                paras, meta, all_spans
            ):
                for start, end, label, score in spans:
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["para_idx"].append(para_idx)
                    out["start"].append(start)
                    out["end"].append(end)
                    out["label"].append(label)
                    out["surface"].append(para[start:end])
                    out["score"].append(score)
                    for name, val in zip(passthrough, extra_vals):
                        out[name].append(val)
            yield pd.DataFrame(out)

    pruned = transcripts.select("conv_id", "turn_idx", "text", *passthrough)
    return pruned.mapInPandas(process_batches, schema)


def mentions_with_context(mentions: DataFrame, transcripts: DataFrame) -> DataFrame:
    """Re-attach role/tool context to mentions for triple lifting.

    Prefer ``detect_mentions(..., passthrough=("role", "tool"))`` —
    zero extra cost. This join path exists for mentions read back from
    storage without context columns; it equi-joins on (conv_id,
    turn_idx), which co-locates under conv_id bucketing.
    """
    if "role" in mentions.columns:
        return mentions
    ctx = transcripts.select("conv_id", "turn_idx", "role", "tool")
    return mentions.join(ctx, ["conv_id", "turn_idx"], "left")
