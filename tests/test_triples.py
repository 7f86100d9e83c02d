"""Triple-lifting tests: hand-computed fixtures against kg_spec rules,
plus full Spark-vs-serial-oracle parity on the synthetic corpus."""

from __future__ import annotations

from datetime import datetime

from portuguese_pt_legal_ner_spark.operators.mentions import (
    detect_mentions,
    mentions_with_context,
)
from portuguese_pt_legal_ner_spark.operators.triples import lift_triples, triples_sorted
from portuguese_pt_legal_ner_spark.oracle_kg import (
    triples_for_conversation,
    triples_for_corpus,
)
from portuguese_pt_legal_ner_spark.sources.tables import (
    TRANSCRIPTS_SCHEMA,
    synthetic_transcripts,
)
from portuguese_pt_legal_ner_spark.synth import generate_transcripts

TS = datetime(2024, 1, 1)


def _turn(conv, idx, role, text, tool=None):
    return {
        "conv_id": conv, "turn_idx": idx, "role": role,
        "text": text, "tool": tool, "ts": TS,
    }


def _spark_triples(spark, turns):
    df = spark.createDataFrame(
        [(t["conv_id"], t["turn_idx"], t["role"], t["text"], t["tool"], t["ts"])
         for t in turns],
        schema=TRANSCRIPTS_SCHEMA,
    )
    mentions = mentions_with_context(detect_mentions(df), df)
    return [r.asDict() for r in triples_sorted(lift_triples(mentions)).collect()]


def _key(t):
    return (t["conv_id"], t["turn_idx"], t["para_idx"], t["subj"], t["pred"],
            t["obj"], t["obj_start"])


def test_same_paragraph_subject_and_predicates():
    turns = [_turn("c1", 0, "user",
                   "O réu João Silva foi notificado em Lisboa, em 12/02/1990.")]
    got = triples_for_conversation(turns)
    assert [(t["subj"], t["pred"], t["obj"]) for t in got] == [
        ("João Silva", "located_in", "Lisboa"),
        ("João Silva", "on_date", "12/02/1990"),
    ]


def test_org_subject_predicates():
    turns = [_turn("c1", 0, "assistant",
                   "O Tribunal de Justiça julgou o processo 987/2021 em 15 de março de 2023.")]
    got = triples_for_conversation(turns)
    assert [(t["subj_label"], t["pred"], t["obj_label"]) for t in got] == [
        ("ORG", "handles_case", "IDP"),
        ("ORG", "on_date", "DAT"),
    ]


def test_system_role_excluded():
    turns = [_turn("c1", 0, "system", "João Silva em Lisboa a 12/02/1990.")]
    assert triples_for_conversation(turns) == []


def test_subject_inheritance_across_turns():
    turns = [
        _turn("c1", 0, "user", "Maria Santos apresentou recurso."),
        _turn("c1", 1, "tool", "Audiência em Porto a 12/02/1990.", tool="case_lookup"),
    ]
    got = triples_for_conversation(turns)
    assert [(t["subj"], t["pred"], t["obj"], t["tool"]) for t in got] == [
        ("Maria Santos", "located_in", "Porto", "case_lookup"),
        ("Maria Santos", "on_date", "12/02/1990", "case_lookup"),
    ]


def test_no_subject_no_triples():
    turns = [_turn("c1", 0, "user", "Audiência em Porto a 12/02/1990.")]
    assert triples_for_conversation(turns) == []


def test_per_org_pair_direction():
    turns = [_turn("c1", 0, "user", "João Silva recorreu ao Ministério Público.")]
    got = triples_for_conversation(turns)
    assert [(t["subj"], t["pred"], t["obj"]) for t in got] == [
        ("João Silva", "involved_with", "Ministério Público"),
    ]


def test_multiline_turn_paragraph_subjects():
    # two paragraphs in one turn: each PER/ORG-bearing paragraph gets
    # its own subject; offsets are paragraph-relative
    turns = [_turn("c1", 0, "user",
                   "João Silva reside em Lisboa.\nO Ministério Público citou 15 de março de 2023.")]
    got = triples_for_conversation(turns)
    assert [(t["para_idx"], t["subj"], t["obj"]) for t in got] == [
        (0, "João Silva", "Lisboa"),
        (1, "Ministério Público", "15 de março de 2023"),
    ]


def test_spark_matches_oracle_on_fixtures(spark):
    turns = [
        _turn("c1", 0, "user", "Maria Santos apresentou recurso."),
        _turn("c1", 1, "tool", "Audiência em Porto a 12/02/1990.", tool="doc_search"),
        _turn("c1", 2, "system", "João Silva em Lisboa."),
        _turn("c2", 0, "assistant",
              "O Tribunal de Justiça julgou o processo 987/2021.\nNotificado em Braga."),
        _turn("c3", 0, "user", "Sem entidades."),
    ]
    want = [_key(t) for t in triples_for_corpus(turns)]
    got = [_key(t) for t in _spark_triples(spark, turns)]
    assert sorted(got) == sorted(want)
    assert want  # fixture actually produces triples


def test_spark_triples_parity_full_corpus(spark):
    turns = generate_transcripts(n_conversations=80, seed=42)
    oracle = {_key(t) for t in triples_for_corpus(turns)}
    df = synthetic_transcripts(spark, n_conversations=80, seed=42, partitions=8)
    mentions = mentions_with_context(detect_mentions(df), df)
    got = {_key(r.asDict()) for r in lift_triples(mentions).collect()}

    tp = len(oracle & got)
    precision = tp / len(got)
    recall = tp / len(oracle)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0


def test_output_ordering_contract(spark):
    turns = generate_transcripts(n_conversations=10, seed=1)
    rows = _spark_triples(spark, turns)
    keys = [(t["conv_id"], t["turn_idx"], t["para_idx"], t["obj_start"]) for t in rows]
    assert keys == sorted(keys)


def test_evidence_struct_export(spark):
    """SURVEY §1.3 export schema: provenance packed into an `evidence`
    struct, lossless vs the flat internal columns."""
    from portuguese_pt_legal_ner_spark.operators.triples import (
        triples_with_evidence,
    )

    turns = generate_transcripts(n_conversations=10, seed=3)
    df = synthetic_transcripts(spark, n_conversations=10, seed=3, partitions=4)
    mentions = mentions_with_context(detect_mentions(df), df)
    flat = lift_triples(mentions)
    packed = triples_with_evidence(flat)
    assert [f.name for f in packed.schema.fields] == [
        "subj", "subj_label", "pred", "obj", "obj_label",
        "conv_id", "turn_idx", "evidence",
    ]
    ev = packed.schema["evidence"].dataType
    assert [f.name for f in ev.fields] == ["para_idx", "obj_start", "role", "tool"]
    flat_rows = {
        (r["subj"], r["pred"], r["obj"], r["conv_id"], r["turn_idx"],
         r["para_idx"], r["obj_start"], r["role"], r["tool"])
        for r in flat.collect()
    }
    packed_rows = {
        (r["subj"], r["pred"], r["obj"], r["conv_id"], r["turn_idx"],
         r["evidence"]["para_idx"], r["evidence"]["obj_start"],
         r["evidence"]["role"], r["evidence"]["tool"])
        for r in packed.collect()
    }
    assert packed_rows == flat_rows and flat_rows
