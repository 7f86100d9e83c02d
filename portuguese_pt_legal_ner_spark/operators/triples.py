"""Triple lifting: mentions → (subj, pred, obj) with provenance.

Implements kg_spec.py (R1–R6) in pure DataFrame operations — no
Python UDFs at all; the whole stage is JVM-side (window functions +
joins + a map-literal predicate lookup), so it rides whole-stage
codegen and AQE.

Shuffle budget at scale (the 100-TB question):
  * one hash shuffle on conv_id family keys for the two windows and
    the paragraph join — all keys are prefixes of (conv_id, turn_idx,
    para_idx), so with the transcripts table bucketed by conv_id the
    exchanges collapse to local sorts;
  * the predicate map is a literal → no join for it;
  * AQE coalesces the small post-filter partitions.

The reference's implicit per-document ordering loop
(src/inference.py:119-127) becomes the explicit
Window.partitionBy('conv_id').orderBy('turn_idx', 'para_idx')
— SURVEY.md §2.6 "window functions".
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kg_spec import EXCLUDED_ROLES, PREDICATES, SUBJECT_LABELS

TRIPLE_COLUMNS = [
    "subj", "subj_label", "pred", "obj", "obj_label",
    "conv_id", "turn_idx", "para_idx", "obj_start", "role", "tool",
]

def _pred_map():
    # built lazily: F.lit needs an active SparkContext
    return F.create_map(
        *chain.from_iterable(
            (F.lit(f"{s} {o}"), F.lit(p)) for (s, o), p in PREDICATES.items()
        )
    )


def lift_triples(mentions_ctx: DataFrame) -> DataFrame:
    """mentions-with-context → triples.

    Input: mentions joined with role/tool context
    (operators.mentions.mentions_with_context): columns conv_id,
    turn_idx, para_idx, start, end, label, surface, score, role, tool.
    """
    m = mentions_ctx.filter(~F.col("role").isin(*EXCLUDED_ROLES))  # R1

    para_keys = ["conv_id", "turn_idx", "para_idx"]

    # R2: earliest PER/ORG mention per paragraph is the subject.
    w_para = Window.partitionBy(*para_keys).orderBy("start")
    para_subj = (
        m.filter(F.col("label").isin(*SUBJECT_LABELS))
        .withColumn("_rn", F.row_number().over(w_para))
        .filter(F.col("_rn") == 1)
        .select(
            *para_keys,
            F.struct(
                F.col("surface").alias("subj"),
                F.col("label").alias("subj_label"),
                F.col("turn_idx").alias("subj_turn_idx"),
                F.col("para_idx").alias("subj_para_idx"),
                F.col("start").alias("subj_start"),
            ).alias("_subj"),
        )
    )

    # R3: paragraphs without a subject inherit the latest earlier one
    # in the same conversation (last non-null over a conv_id window).
    paras = m.select(*para_keys).distinct()
    w_conv = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx", "para_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eff_subj = (
        paras.join(para_subj, para_keys, "left")
        .withColumn("_eff", F.last("_subj", ignorenulls=True).over(w_conv))
        .filter(F.col("_eff").isNotNull())
        .select(*para_keys, "_eff")
    )

    # R4: all other mentions in the paragraph are objects.
    joined = m.join(eff_subj, para_keys)
    not_self = ~(
        (F.col("turn_idx") == F.col("_eff.subj_turn_idx"))
        & (F.col("para_idx") == F.col("_eff.subj_para_idx"))
        & (F.col("start") == F.col("_eff.subj_start"))
    )
    triples = (
        joined.filter(not_self)
        .select(
            F.col("_eff.subj").alias("subj"),
            F.col("_eff.subj_label").alias("subj_label"),
            _pred_map()[
                F.concat_ws(" ", F.col("_eff.subj_label"), F.col("label"))
            ].alias("pred"),
            F.col("surface").alias("obj"),
            F.col("label").alias("obj_label"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("para_idx"),
            F.col("start").alias("obj_start"),
            F.col("role"),
            F.col("tool"),
        )
    )
    # R6: stable output ordering contract.
    return triples.sortWithinPartitions("conv_id", "turn_idx", "para_idx", "obj_start")


def triples_sorted(triples: DataFrame) -> DataFrame:
    """Global ordering for goldens/export (R6)."""
    return triples.orderBy("conv_id", "turn_idx", "para_idx", "obj_start")
