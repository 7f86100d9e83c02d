"""JSONL document source — the de-facto wire format of web-scale
training corpora (one JSON object per line, often mixed-quality).

The reference reads plain-text and CoNLL files (src/data.py:297-348,
src/inference.py:152-154) and trusts them; a 100-TB crawl corpus
cannot be trusted, so this source makes the malformed-line policy
EXPLICIT instead of letting the default PERMISSIVE mode silently null
out bad rows:

  * schema is declared, never inferred — inference would scan the
    corpus twice and lock in whatever the first files happened to
    contain;
  * malformed lines land in a quarantine column
    (`columnNameOfCorruptRecord`) and can be split off as a DataFrame
    for auditing — the per-paragraph error-guard philosophy (ref
    src/inference.py:214-216: log and continue, never crash the run)
    applied at the source boundary;
  * `mode="FAILFAST"` is one argument away when a pipeline would
    rather die than drop (validation runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): parse JSONL documents under `path`.

    good — rows that parsed against DOCUMENTS_JSONL_SCHEMA (without
    the quarantine column); quarantined — one row per malformed line
    with the raw text preserved for auditing. Both are lazy; counting
    `quarantined` is the no-silent-drops audit.

    Shape: a TEXT scan + from_json, not spark.read.json — the raw
    JSON source forbids any plan whose scan references only the
    corrupt-record column (so `quarantined.count()` would throw after
    column pruning), while from_json over a text column has no such
    restriction and parses inside whole-stage codegen just the same."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        "value",
        F.from_json(
            "value",
            DOCUMENTS_JSONL_SCHEMA,
            {"mode": mode, "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r"),
    )
    good = parsed.filter(
        F.col("r").isNotNull() & F.col("r._corrupt").isNull()
    ).select("r.doc_id", "r.text", "r.lang", "r.source")
    quarantined = parsed.filter(
        F.col("r").isNull() | F.col("r._corrupt").isNotNull()
    ).select(F.col("value").alias("raw_line"))
    return good, quarantined


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """One JSON object per line, snappy-free plain text — the format a
    downstream tokenizer job or another engine ingests directly."""
    docs.write.mode("overwrite").json(path)
