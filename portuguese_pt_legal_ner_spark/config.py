"""YAML-driven configuration — parity with the reference's only
public entry UX.

The reference drives every run from a YAML file loaded by
``ConfigManager.load_inference_config`` (ref src/config.py:254-281)
into nested dataclasses: ``ModelConfig`` (src/config.py:18-38),
``InferenceConfig`` (src/config.py:42-63, defaults batch_size=16,
max_length=512, confidence_threshold=0.5) wrapped in
``InferenceExperimentConfig`` (src/config.py:180-200).

This module re-expresses that surface for the Spark engine, with one
Spark-native extension block (``kg``) for the cluster-shaped knobs the
reference has no analog for (workdir, salting, master). Unknown YAML
keys raise — same failure mode as the reference's dataclass(**dict).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import yaml


def _from_dict(cls, d: dict):
    known = {f.name for f in fields(cls)}
    unknown = set(d) - known
    if unknown:
        raise TypeError(f"{cls.__name__}: unknown config keys {sorted(unknown)}")
    return cls(**d)


@dataclass
class ModelConfig:
    """Mirror of ref src/config.py:18-38 (name/num_labels/dropouts)."""

    name: str = "eduagarcia/RoBERTaLexPT-base"
    num_labels: int = 19  # 9 entities * 2 (B-, I-) + O
    dropout: float = 0.1
    attention_dropout: float = 0.1
    hidden_dropout: float = 0.1


@dataclass
class InferenceConfig:
    """Mirror of ref src/config.py:42-63."""

    model_path: str = ""
    input_file: str = ""
    output_file: str = ""
    batch_size: int = 16
    max_length: int = 512
    confidence_threshold: float = 0.5


@dataclass
class KGConfig:
    """Spark-native extension: the KG-construction knobs (no reference
    analog — the serial engine has no cluster shape to configure)."""

    workdir: str = ""
    alias_dict: str = "builtin"  # builtin | none
    salt_buckets: int = 16
    master: str | None = None
    synthetic_conversations: int = 0  # >0: generate instead of input_file
    # reliable-checkpoint dir (HDFS/object store) for the iterative
    # connected-components stages (entity resolution here; the dedup
    # operators take the same knob directly). Empty -> localCheckpoint:
    # fast, but UNRECOVERABLE on executor loss — set this on a real
    # cluster so a 1000-executor CC run recomputes instead of dying.
    checkpoint_dir: str = ""


@dataclass
class InferenceExperimentConfig:
    """Mirror of ref src/config.py:180-200 plus the `kg` block."""

    experiment_name: str = "pt_legal_ner_inference"
    experiment_type: str = "inference"
    description: str = ""
    model: ModelConfig = field(default_factory=ModelConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    kg: KGConfig = field(default_factory=KGConfig)


def load_inference_config(config_path: str) -> InferenceExperimentConfig:
    """Ref ConfigManager.load_inference_config (src/config.py:254-281):
    YAML → nested dataclasses; missing file raises FileNotFoundError,
    malformed YAML raises yaml.YAMLError."""
    with open(config_path) as f:
        config_dict = yaml.safe_load(f) or {}
    if "model" in config_dict:
        config_dict["model"] = _from_dict(ModelConfig, config_dict["model"])
    if "inference" in config_dict:
        config_dict["inference"] = _from_dict(
            InferenceConfig, config_dict["inference"]
        )
    if "kg" in config_dict:
        config_dict["kg"] = _from_dict(KGConfig, config_dict["kg"])
    return _from_dict(InferenceExperimentConfig, config_dict)
