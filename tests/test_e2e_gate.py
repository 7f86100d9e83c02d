"""The BASELINE.md gate, end-to-end: full Spark pipeline triples vs
the serial reference-path oracle, measured with the engine's own
triple_pr metric operator — P/R ≥ 0.95 (target 1.0), stable
(conv_id, turn_idx) ordering, per-turn text equality."""

from __future__ import annotations

import pytest

from portuguese_pt_legal_ner_spark.operators.metrics import triple_pr
from portuguese_pt_legal_ner_spark.oracle_kg import triples_for_corpus
from portuguese_pt_legal_ner_spark.plans.pipeline import extract_triples
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts
from portuguese_pt_legal_ner_spark.synth import generate_transcripts

N_CONV = 150
SEED = 42


@pytest.fixture(scope="module")
def spark_triples(spark):
    t = synthetic_transcripts(spark, n_conversations=N_CONV, seed=SEED, partitions=8)
    return extract_triples(t).persist()


@pytest.fixture(scope="module")
def oracle_triples(spark):
    rows = triples_for_corpus(generate_transcripts(n_conversations=N_CONV, seed=SEED))
    return spark.createDataFrame(rows)


def test_triple_pr_gate(spark, spark_triples, oracle_triples):
    p, r = triple_pr(oracle_triples, spark_triples)
    assert p >= 0.95, f"precision {p} < 0.95"
    assert r >= 0.95, f"recall {r} < 0.95"
    assert p == 1.0 and r == 1.0  # shared decode → exact


def test_stable_ordering_per_partition(spark, spark_triples):
    # R6: rows within each partition follow (conv_id, turn_idx,
    # para_idx, obj_start) order after sortWithinPartitions
    def check(it):
        prev = None
        for row in it:
            key = (row.conv_id, row.turn_idx, row.para_idx, row.obj_start)
            assert prev is None or key >= prev, (prev, key)
            prev = key
        yield None

    list(spark_triples.rdd.mapPartitions(check).collect())


def test_per_turn_text_equality(spark, spark_triples):
    # every triple's obj surface must equal the slice of its source
    # paragraph — the per-turn text-equality invariant
    from portuguese_pt_legal_ner_spark.reference_path import (
        split_into_paragraphs,
    )

    turns = {
        (t["conv_id"], t["turn_idx"]): t["text"]
        for t in generate_transcripts(n_conversations=N_CONV, seed=SEED)
    }
    for row in spark_triples.collect():
        text = turns[(row["conv_id"], row["turn_idx"])]
        para = split_into_paragraphs(text)[row["para_idx"]]
        assert para[row["obj_start"] : row["obj_start"] + len(row["obj"])] == row["obj"]
