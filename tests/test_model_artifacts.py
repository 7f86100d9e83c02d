"""K5 model-artifact shipping (round-2 verdict item 9): the artifact
dir written by save_model_artifact must reach executors via SparkFiles
and be loaded by the detector's per-worker singleton — the exact load
path a real checkpoint swap uses (ref src/models.py:177-211,
src/inference.py:65-94)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.model_artifacts import (
    load_model_artifact,
    load_shipped_artifact,
    save_model_artifact,
    ship_model_artifact,
)
from portuguese_pt_legal_ner_spark.operators.mentions import detect_mentions
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "model-v1")
    save_model_artifact(path, confidence_threshold=0.7)
    art = load_model_artifact(path)
    assert art.confidence_threshold == 0.7
    assert art.config["num_labels"] == len(art.labels)


def test_corrupt_weights_detected(tmp_path):
    path = str(tmp_path / "model-bad")
    save_model_artifact(path)
    with open(os.path.join(path, "weights.bin"), "ab") as f:
        f.write(b"tamper")
    with pytest.raises(ValueError, match="corrupt"):
        load_model_artifact(path)


def test_artifact_readable_executor_side(spark, tmp_path):
    """Prove the bytes actually ship: executors re-hash weights.bin via
    SparkFiles and must agree with the driver-side artifact."""
    path = str(tmp_path / "model-ship")
    save_model_artifact(path, confidence_threshold=0.5)
    name = ship_model_artifact(spark, path)
    driver_sha = load_model_artifact(path).weights_sha256

    import pandas as pd  # noqa: PLC0415

    def probe(batches):
        art = load_shipped_artifact(name)
        for batch in batches:
            yield pd.DataFrame(
                {"sha": [art.weights_sha256] * len(batch)}
            )

    shas = (
        spark.range(0, 8, numPartitions=4)
        .mapInPandas(probe, "sha string")
        .select(F.collect_set("sha").alias("s"))
        .collect()[0]["s"]
    )
    assert shas == [driver_sha]


def test_detector_uses_artifact_threshold(spark, tmp_path):
    """detect_mentions(model_artifact=...) must take its confidence
    threshold from the shipped artifact config: a 0.95-threshold
    artifact yields exactly the default run filtered to score ≥ 0.95."""
    t = synthetic_transcripts(spark, n_conversations=30, seed=42)
    path = str(tmp_path / "model-hi")
    save_model_artifact(path, confidence_threshold=0.95)
    name = ship_model_artifact(spark, path)

    def rows(df):
        return sorted(
            (r["conv_id"], r["turn_idx"], r["para_idx"], r["start"],
             r["end"], r["label"], round(r["score"], 6))
            for r in df.collect()
        )

    default = detect_mentions(t).collect()
    expected = sorted(
        (r["conv_id"], r["turn_idx"], r["para_idx"], r["start"],
         r["end"], r["label"], round(r["score"], 6))
        for r in default
        if r["score"] >= 0.95
    )
    got = rows(detect_mentions(t, model_artifact=name))
    assert got and got == expected
    assert len(got) < len(default)  # the threshold really bit


def test_artifact_config_shape(tmp_path):
    path = str(tmp_path / "model-cfg")
    save_model_artifact(path, confidence_threshold=0.6)
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["model_type"] == "mock-token-classifier"
    assert cfg["confidence_threshold"] == 0.6
