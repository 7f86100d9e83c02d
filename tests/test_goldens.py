"""Committed-golden tests (FIXTURES.md §3): the Spark pipeline must
reproduce the checked-in oracle outputs exactly. Pins semantics across
refactors — any decode/spec drift fails here before parity suites."""

from __future__ import annotations

import json
from pathlib import Path

from portuguese_pt_legal_ner_spark.operators.mentions import detect_mentions
from portuguese_pt_legal_ner_spark.plans.pipeline import extract_triples
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _load(name):
    with open(GOLDEN_DIR / name, encoding="utf-8") as f:
        return json.load(f)


def test_mentions_match_committed_golden(spark):
    t = synthetic_transcripts(spark, n_conversations=20, seed=42, partitions=4)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["para_idx"], r["start"], r["end"],
         r["label"], r["surface"], round(r["score"], 9))
        for r in detect_mentions(t).collect()
    )
    want = sorted(
        (m["conv_id"], m["turn_idx"], m["para_idx"], m["start"], m["end"],
         m["label"], m["surface"], m["score"])
        for m in _load("mentions_golden.json")
    )
    assert got == want


def test_triples_match_committed_golden(spark):
    t = synthetic_transcripts(spark, n_conversations=20, seed=42, partitions=4)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["para_idx"], r["subj"], r["subj_label"],
         r["pred"], r["obj"], r["obj_label"], r["obj_start"])
        for r in extract_triples(t).collect()
    )
    want = sorted(
        (m["conv_id"], m["turn_idx"], m["para_idx"], m["subj"], m["subj_label"],
         m["pred"], m["obj"], m["obj_label"], m["obj_start"])
        for m in _load("triples_golden.json")
    )
    assert got == want
