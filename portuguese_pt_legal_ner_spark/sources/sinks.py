"""Sinks (SURVEY §2.5).

K1 — the reference's JSONL prediction writer (src/inference.py:160-166)
emits one ``{"text": <paragraph>, "labels": [[start, end, "LABEL"],
...]}`` object per paragraph, ``ensure_ascii=False``, INCLUDING
paragraphs with zero entities (src/inference.py:124-127). The Spark
re-expression keeps that record contract exactly so a reference
consumer can point at our output: paragraph spine from the transcripts
table (explode the paragraph split), left join to mentions, labels
collected in (start, end) order.

Production sink is the Iceberg `mentions` table append
(df.writeTo(...).append()); this JSONL path exists for parity with
the reference's file contract and for golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prediction_records(transcripts: DataFrame, mentions: DataFrame) -> DataFrame:
    """One row per non-empty paragraph: (conv_id, turn_idx, para_idx,
    text, labels array<array — [start,end,label] encoded as struct>),
    paragraphs without entities included with an empty list."""
    paras = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.split(F.col("text"), "\n")).alias("_pos", "_raw"),
        )
        .withColumn("text", F.trim(F.col("_raw")))
        .filter(F.length("text") > 0)
        # para_idx counts only NON-EMPTY paragraphs, matching the
        # reference's filtered list (src/inference.py:182)
        .withColumn(
            "para_idx",
            F.row_number().over(
                Window.partitionBy("conv_id", "turn_idx").orderBy("_pos")
            )
            - 1,
        )
        .drop("_pos", "_raw")
    )
    labels = (
        mentions.groupBy("conv_id", "turn_idx", "para_idx")
        .agg(
            F.sort_array(F.collect_list(F.struct("start", "end", "label"))).alias(
                "labels"
            )
        )
    )
    return (
        paras.join(labels, ["conv_id", "turn_idx", "para_idx"], "left")
        .withColumn(
            "labels",
            F.coalesce(
                F.col("labels"),
                F.array().cast("array<struct<start:int,end:int,label:string>>"),
            ),
        )
        .select("conv_id", "turn_idx", "para_idx", "text", "labels")
    )


def predictions_to_jsonl(records: DataFrame, path: str) -> None:
    """Write reference-format JSONL: {"text": ..., "labels": [[s,e,L]]}.

    json tuples ride as mixed-type arrays; to match the reference's
    heterogeneous [int, int, str] lists exactly we assemble the JSON
    string with concat (ensure_ascii=False ≡ Spark's raw UTF-8)."""
    label_json = F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                F.col("labels"),
                lambda s: F.concat(
                    F.lit("["),
                    s["start"].cast("string"),
                    F.lit(", "),
                    s["end"].cast("string"),
                    F.lit(', "'),
                    s["label"],
                    F.lit('"]'),
                ),
            ),
            ", ",
        ),
        F.lit("]"),
    )
    with_json = records.withColumn("_tj", F.to_json(F.struct(F.col("text"))))
    # to_json(struct(text)) == {"text":"<escaped>"}; slice out the
    # escaped string literal (drop the 8-char prefix and trailing })
    text_literal = F.col("_tj").substr(F.lit(9), F.length("_tj") - F.lit(9))
    line = F.concat(
        F.lit('{"text": '),
        text_literal,
        F.lit(', "labels": '),
        label_json,
        F.lit("}"),
    )
    (
        with_json.orderBy("conv_id", "turn_idx", "para_idx")
        .select(line.alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
