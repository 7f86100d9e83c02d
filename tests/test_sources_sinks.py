"""CoNLL source (S1/A7) and JSONL prediction sink (K1) tests —
including byte-level parity of the JSONL records with the serial
reference path's json.dump output."""

from __future__ import annotations

import glob
import json
import os

from portuguese_pt_legal_ner_spark.operators.mentions import detect_mentions
from portuguese_pt_legal_ner_spark.reference_path import (
    process_document,
)
from portuguese_pt_legal_ner_spark.sources.conll import (
    parse_conll_text,
    read_conll,
    train_test_split,
)
from portuguese_pt_legal_ner_spark.sources.sinks import (
    prediction_records,
    predictions_to_jsonl,
)
from portuguese_pt_legal_ner_spark.sources.tables import synthetic_transcripts
from portuguese_pt_legal_ner_spark.synth import generate_transcripts

CONLL = (
    "O\tO\n"
    "réu\tO\n"
    "João\tB-PER\n"
    "Silva\tI-PER\n"
    "\n"
    "malformed-line-no-tab\n"
    "Lisboa\tB-LOC\textra-column-ignored\n"
    "\n"
    "\n"
    "fim\tO\n"
)


def test_parse_conll_reference_semantics():
    sents = parse_conll_text(CONLL)
    assert len(sents) == 3
    assert sents[0] == (["O", "réu", "João", "Silva"], ["O", "O", "B-PER", "I-PER"])
    # malformed line skipped silently; extra columns tolerated
    assert sents[1] == (["Lisboa"], ["B-LOC"])
    assert sents[2] == (["fim"], ["O"])


def test_read_conll_distributed(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.conll").write_text(CONLL, encoding="utf-8")
    df = read_conll(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 9  # 3 sentences × 3 files
    per_file = {}
    for r in rows:
        per_file.setdefault(os.path.basename(r["file"]), []).append(r)
    assert all(len(v) == 3 for v in per_file.values())


def test_train_test_split_disjoint_and_complete(spark):
    df = spark.range(1000)
    train, test = train_test_split(df, test_size=0.2, seed=7)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 1000
    assert 100 < n_test < 300  # Bernoulli split around 200
    assert train.join(test, "id").count() == 0


def test_jsonl_sink_matches_reference_format(spark, tmp_path):
    turns = generate_transcripts(n_conversations=20, seed=42)
    t = synthetic_transcripts(spark, n_conversations=20, seed=42)
    mentions = detect_mentions(t)
    records = prediction_records(t, mentions)
    out = str(tmp_path / "preds")
    predictions_to_jsonl(records, out)

    lines = []
    for part in sorted(glob.glob(os.path.join(out, "part-*"))):
        with open(part, encoding="utf-8") as f:
            lines.extend(line for line in f if line.strip())

    # serial reference path over the same turns, same ordering
    want = []
    for turn in sorted(turns, key=lambda x: (x["conv_id"], x["turn_idx"])):
        for rec in process_document(turn["text"]):
            want.append(rec)

    assert len(lines) == len(want)
    for line, rec in zip(lines, want):
        got = json.loads(line)
        assert got == {"text": rec["text"], "labels": rec["labels"]}
        # byte-level: ensure_ascii=False parity (accented chars raw)
        expected_line = json.dumps(
            {"text": rec["text"], "labels": rec["labels"]}, ensure_ascii=False
        )
        assert line.rstrip("\n") == expected_line


def test_entityless_paragraphs_present_in_records(spark):
    t = synthetic_transcripts(spark, n_conversations=40, seed=42)
    records = prediction_records(t, detect_mentions(t))
    empty = records.filter("size(labels) = 0").count()
    assert empty > 0  # reference keeps them (src/inference.py:124-127)


def test_jsonl_source_quarantines_malformed(spark, tmp_path):
    """JSONL document source: declared schema, malformed lines land in
    quarantine instead of silently nulling out (the source-boundary
    form of the reference's per-paragraph error guard)."""
    from portuguese_pt_legal_ner_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "bom dia", "lang": "pt", "source": "s0"}\n'
        'this is not json at all\n'
        '{"doc_id": 2, "text": "boa tarde", "lang": "pt", "source": "s1"}\n'
        '{"doc_id": 3, "text": "ola", "lang":\n'
    )
    good, quarantined = read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "bom dia", 2: "boa tarde"}
    bad = [r["raw_line"] for r in quarantined.collect()]
    assert len(bad) == 2
    assert "this is not json at all" in bad[0] or "this is not json at all" in bad
    # round-trip through the sink stays parseable
    out = tmp_path / "out"
    write_documents_jsonl(good, str(out))
    good2, quarantined2 = read_documents_jsonl(spark, str(out))
    assert {r["doc_id"] for r in good2.collect()} == {1, 2}
    assert quarantined2.count() == 0
