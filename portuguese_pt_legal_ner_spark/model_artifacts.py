"""Model-artifact shipping + executor-side loading (K5).

The reference persists model + tokenizer to an artifact directory
(``NERModel.save_model``, ref src/models.py:177-211) and inference
loads from that directory (``InferenceEngine.__init__`` →
``_load_model``, ref src/inference.py:65-94). On a cluster the
artifact must reach every executor; the spark-submit shapes are
``--archives model.tgz#model`` or ``SparkContext.addFile(dir,
recursive=True)`` — this module implements the addFile shape, which
works identically under local[N] and a real cluster.

Real HF weights can't run in this sandbox, so the artifact carries
the detector's CONFIG (confidence threshold, label inventory) plus a
deterministic weights blob whose sha256 is recorded in config.json —
executor-side integrity is therefore testable. The detector
(operators.mentions.detect_mentions) resolves the artifact ONCE per
python worker via SparkFiles and caches it in a module global — the
executor-singleton pattern a real checkpoint load uses (load the
model once per worker, not per batch).
"""

from __future__ import annotations

import hashlib
import json
import os

_ARTIFACT_CACHE: dict[str, "ModelArtifact"] = {}


class ModelArtifact:
    """Loaded artifact: config dict, label list, weights sha256."""

    def __init__(self, config: dict, labels: list[str], weights_sha256: str):
        self.config = config
        self.labels = labels
        self.weights_sha256 = weights_sha256

    @property
    def confidence_threshold(self) -> float:
        return float(self.config["confidence_threshold"])


def save_model_artifact(
    path: str,
    confidence_threshold: float = 0.5,
    labels: list[str] | None = None,
    weights_seed: int = 42,
) -> str:
    """Write the artifact dir (config.json, labels.txt, weights.bin) —
    the mock analog of NERModel.save_model (ref src/models.py:177-211).
    Returns the artifact's basename (the name executors resolve)."""
    from .labels import ENTITY_LABELS  # noqa: PLC0415

    labels = labels if labels is not None else list(ENTITY_LABELS)
    os.makedirs(path, exist_ok=True)
    # deterministic dummy weights: stands in for pytorch_model.bin
    weights = hashlib.sha256(f"weights:{weights_seed}".encode()).digest() * 32
    with open(os.path.join(path, "weights.bin"), "wb") as f:
        f.write(weights)
    config = {
        "model_type": "mock-token-classifier",
        "confidence_threshold": confidence_threshold,
        "num_labels": len(labels),
        "weights_sha256": hashlib.sha256(weights).hexdigest(),
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(path, "labels.txt"), "w") as f:
        f.write("\n".join(labels) + "\n")
    return os.path.basename(os.path.normpath(path))


def load_model_artifact(dirpath: str) -> ModelArtifact:
    """Load + integrity-check an artifact dir (the _load_model analog,
    ref src/inference.py:76-94)."""
    with open(os.path.join(dirpath, "config.json")) as f:
        config = json.load(f)
    with open(os.path.join(dirpath, "labels.txt")) as f:
        labels = [line for line in f.read().splitlines() if line]
    with open(os.path.join(dirpath, "weights.bin"), "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    if sha != config["weights_sha256"]:
        raise ValueError(
            f"model artifact corrupt: weights sha {sha[:12]}… != "
            f"config {config['weights_sha256'][:12]}…"
        )
    if len(labels) != config["num_labels"]:
        raise ValueError("model artifact corrupt: label count mismatch")
    return ModelArtifact(config, labels, sha)


def ship_model_artifact(spark, path: str) -> str:
    """Driver-side: distribute the artifact dir to every executor
    (addFile recursive — the --archives analog). Returns the name to
    pass to detect_mentions(model_artifact=...)."""
    spark.sparkContext.addFile(path, recursive=True)
    return os.path.basename(os.path.normpath(path))


def load_shipped_artifact(name: str) -> ModelArtifact:
    """Executor- (or driver-) side: resolve the shipped artifact by
    name via SparkFiles and cache it per python worker — the
    once-per-worker model-load singleton."""
    art = _ARTIFACT_CACHE.get(name)
    if art is None:
        from pyspark import SparkFiles  # noqa: PLC0415

        art = load_model_artifact(SparkFiles.get(name))
        _ARTIFACT_CACHE[name] = art
    return art
