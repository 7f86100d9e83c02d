"""YAML config entry (S4 parity): loader semantics mirror the
reference's ConfigManager.load_inference_config (ref
src/config.py:254-281) and the spark-submit job runs end-to-end from a
YAML file alone."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

from portuguese_pt_legal_ner_spark.config import (
    InferenceExperimentConfig,
    load_inference_config,
)

REPO = Path(__file__).resolve().parent.parent


def test_load_full_config(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "experiment_name: exp1\n"
        "model:\n  num_labels: 19\n"
        "inference:\n  confidence_threshold: 0.7\n  max_length: 256\n"
        "kg:\n  workdir: /tmp/x\n  salt_buckets: 4\n"
    )
    cfg = load_inference_config(str(p))
    assert cfg.experiment_name == "exp1"
    assert cfg.inference.confidence_threshold == 0.7
    assert cfg.inference.max_length == 256
    assert cfg.inference.batch_size == 16      # ref default, config.py:61
    assert cfg.kg.salt_buckets == 4


def test_defaults_match_reference():
    cfg = InferenceExperimentConfig()
    assert cfg.inference.max_length == 512       # ref src/config.py:62
    assert cfg.inference.confidence_threshold == 0.5  # ref src/config.py:63
    assert cfg.model.num_labels == 19            # ref src/config.py:35


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("inference:\n  not_a_field: 1\n")
    with pytest.raises(TypeError, match="not_a_field"):
        load_inference_config(str(p))


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_inference_config("/nonexistent/cfg.yaml")


def test_pipeline_runs_from_yaml(tmp_path):
    """The reference's public UX: one YAML file drives the whole run."""
    workdir = tmp_path / "kg_out"
    cfg = tmp_path / "exp.yaml"
    cfg.write_text(
        "experiment_name: yaml_smoke\n"
        "inference:\n  confidence_threshold: 0.5\n"
        f"kg:\n  workdir: {workdir}\n  synthetic_conversations: 20\n"
        "  master: local[2]\n"
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_pipeline.py"),
         "--config", str(cfg)],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (workdir / "triples" / "_SUCCESS").exists()
    assert (workdir / "edges" / "_SUCCESS").exists()
    # tracker recorded the config-derived experiment name
    import duckdb

    names = duckdb.sql(
        f"SELECT DISTINCT name FROM read_parquet('{workdir}/_runs/runs.parquet/*.parquet')"
    ).fetchall()
    assert ("yaml_smoke",) in names


def test_pipeline_reliable_checkpoint_from_yaml(tmp_path):
    """kg.checkpoint_dir flows config → run_pipeline → KGPipeline →
    resolve_entities → components_auto (round-3 verdict item 4): the
    run completes with RELIABLE checkpoints and actually writes CC
    iteration state into the configured directory."""
    workdir = tmp_path / "kg_out"
    ckpt = tmp_path / "ckpt"
    cfg = tmp_path / "exp.yaml"
    cfg.write_text(
        "experiment_name: yaml_ckpt\n"
        f"kg:\n  workdir: {workdir}\n  synthetic_conversations: 20\n"
        f"  master: local[2]\n  checkpoint_dir: {ckpt}\n"
    )
    # force the distributed CC path (the driver union-find fast path
    # would legitimately skip checkpointing on a 20-conversation graph)
    env = {**__import__("os").environ, "SPARK_GRAFT_DRIVER_CC_MAX_EDGES": "0"}
    proc = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_pipeline.py"),
         "--config", str(cfg)],
        capture_output=True, text=True, timeout=600, cwd=str(REPO), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (workdir / "edges" / "_SUCCESS").exists()
    # reliable checkpoints materialize as rdd-* dirs under the
    # configured path (localCheckpoint would leave it empty)
    assert any(ckpt.rglob("rdd-*")), (
        f"no reliable-checkpoint state under {ckpt}"
    )


def test_input_and_synthetic_conflict(tmp_path):
    """Explicit --input + explicit --synthetic is refused, not
    silently resolved (round-3 advice: the precedence flipped once
    already between rounds)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_pipeline.py"),
         "--input", "/tmp/nope.parquet", "--synthetic", "5",
         "--workdir", str(tmp_path / "w")],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert proc.returncode != 0
    assert "mutually exclusive" in proc.stderr


def test_dedup_cli_build_then_assign(tmp_path):
    """The dedup family's spark-submit surface: build clusters + the
    incremental index from a corpus, then assign an increment against
    it in a SEPARATE process (the index round-trips through parquet)."""
    import duckdb

    corpus = tmp_path / "corpus"
    inc = tmp_path / "inc"
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(2, 'o tribunal da relacao confirmou a sentenca um dois tres quatro cinco'),"
        "(9, 'o tribunal da relacao confirmou a sentenca um dois tres quatro cinco'),"
        "(40, 'texto totalmente diferente sobre outra coisa qualquer aqui agora')"
        ") t(doc_id, text)) TO '" + str(corpus) + "' (FORMAT PARQUET)"
    )
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(100, 'o tribunal da relacao confirmou a sentenca um dois tres quatro SEIS'),"
        "(101, 'conteudo novo que nao parece com nada visto antes em lado nenhum')"
        ") t(doc_id, text)) TO '" + str(inc) + "' (FORMAT PARQUET)"
    )
    idx = tmp_path / "mhidx"
    out1 = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_dedup.py"), "build",
         "--input", str(corpus), "--index-dir", str(idx),
         "--threshold", "0.5", "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert out1.returncode == 0, out1.stderr[-2000:]
    import json as _json

    built = _json.loads(out1.stdout.strip().splitlines()[-1])
    assert built["docs"] == 3 and built["clusters"] == 2
    out2 = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_dedup.py"), "assign",
         "--input", str(inc), "--corpus", str(corpus),
         "--index-dir", str(idx), "--threshold", "0.5",
         "--out", str(tmp_path / "assigned"), "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    rows = dict(
        duckdb.sql(
            f"SELECT doc_id, cluster_id FROM read_parquet('{tmp_path}/assigned/*.parquet')"
        ).fetchall()
    )
    assert rows == {100: 2, 101: 101}


def test_dedup_cli_simhash_build_then_assign(tmp_path):
    """The simhash family through the CLI: build the index in one
    process, assign an increment in another WITHOUT --corpus — the
    hamming verify reads sim words straight from the index bands."""
    import json
    import subprocess
    import sys

    import duckdb

    corpus = tmp_path / "corpus"
    inc = tmp_path / "inc"
    body = "o tribunal da relacao confirmou a sentenca um dois tres quatro cinco"
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        f"(2, '{body}'),"
        f"(9, '{body}'),"
        "(40, 'texto totalmente diferente sobre outra coisa qualquer aqui agora')"
        ") t(doc_id, text)) TO '" + str(corpus) + "' (FORMAT PARQUET)"
    )
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        f"(100, '{body}'),"
        "(101, 'conteudo novo que nao parece com nada visto antes em lado nenhum')"
        ") t(doc_id, text)) TO '" + str(inc) + "' (FORMAT PARQUET)"
    )
    idx = tmp_path / "shidx"
    out1 = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_dedup.py"), "build",
         "--family", "simhash", "--input", str(corpus),
         "--index-dir", str(idx), "--max-hamming", "7", "--n-bands", "8",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert out1.returncode == 0, out1.stderr[-2000:]
    built = json.loads(out1.stdout.strip().splitlines()[-1])
    assert built["family"] == "simhash"
    assert built["docs"] == 3 and built["clusters"] == 2
    out2 = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "run_dedup.py"), "assign",
         "--family", "simhash", "--input", str(inc),
         "--index-dir", str(idx), "--max-hamming", "7",
         "--out", str(tmp_path / "assigned"), "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    rows = dict(
        duckdb.sql(
            f"SELECT doc_id, cluster_id FROM read_parquet('{tmp_path}/assigned/*.parquet')"
        ).fetchall()
    )
    assert rows == {100: 2, 101: 101}
