"""Metrics-math tests: the Spark P/R/F1 joins reproduce seqeval
entity-level numbers on hand-computable cases (SURVEY §5 item 5,
mirroring src/training.py:46-101 semantics)."""

from __future__ import annotations

import pytest

from portuguese_pt_legal_ner_spark.operators.metrics import (
    classification_report,
    confusion_matrix,
    span_pr,
)

SCHEMA = (
    "conv_id string, turn_idx int, para_idx int, start int, end int, label string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def gold(spark):
    return _df(
        spark,
        [
            ("c1", 0, 0, 0, 10, "PER"),
            ("c1", 0, 0, 15, 21, "LOC"),
            ("c1", 1, 0, 0, 8, "ORG"),
            ("c2", 0, 0, 5, 15, "DAT"),
        ],
    )


def test_perfect_predictions(spark, gold):
    p, r = span_pr(gold, gold)
    assert p == 1.0 and r == 1.0


def test_hand_computed_report(spark, gold):
    # pred: PER exact hit; LOC wrong boundaries; ORG hit; DAT missed;
    # one spurious TEL  →  tp: PER 1, ORG 1; n_pred: PER 1, LOC 1,
    # ORG 1, TEL 1; support: PER 1, LOC 1, ORG 1, DAT 1
    pred = _df(
        spark,
        [
            ("c1", 0, 0, 0, 10, "PER"),
            ("c1", 0, 0, 14, 21, "LOC"),   # off-by-one start → miss
            ("c1", 1, 0, 0, 8, "ORG"),
            ("c2", 0, 0, 30, 35, "TEL"),   # spurious
        ],
    )
    rep = {r["label"]: r for r in classification_report(gold, pred).collect()}
    assert rep["PER"]["precision"] == 1.0 and rep["PER"]["recall"] == 1.0
    assert rep["LOC"]["precision"] == 0.0 and rep["LOC"]["recall"] == 0.0
    assert rep["ORG"]["f1"] == 1.0
    assert rep["DAT"]["precision"] == 0.0 and rep["DAT"]["support"] == 1
    assert rep["TEL"]["support"] == 0 and rep["TEL"]["precision"] == 0.0
    micro = rep["__micro__"]
    # micro: tp=2, n_pred=4, support=4 → P=R=0.5, F1=0.5 (seqeval math)
    assert micro["precision"] == 0.5
    assert micro["recall"] == 0.5
    assert micro["f1"] == 0.5
    assert micro["support"] == 4


def test_label_switch_counts_as_miss_and_spurious(spark):
    # same span, wrong type: seqeval counts a FP for pred type and FN
    # for gold type
    gold = _df(spark, [("c1", 0, 0, 0, 5, "PER")])
    pred = _df(spark, [("c1", 0, 0, 0, 5, "ORG")])
    rep = {r["label"]: r for r in classification_report(gold, pred).collect()}
    assert rep["PER"]["recall"] == 0.0
    assert rep["ORG"]["precision"] == 0.0
    assert rep["__micro__"]["precision"] == 0.0


def test_confusion_matrix_cells(spark):
    gold = _df(
        spark,
        [
            ("c1", 0, 0, 0, 5, "PER"),   # matched, label switch → (PER, ORG)
            ("c1", 0, 0, 10, 15, "LOC"), # missed → (LOC, O)
        ],
    )
    pred = _df(
        spark,
        [
            ("c1", 0, 0, 0, 5, "ORG"),
            ("c1", 0, 0, 20, 25, "DAT"),  # spurious → (O, DAT)
        ],
    )
    cells = {
        (r["gold_label"], r["pred_label"]): r["n"]
        for r in confusion_matrix(gold, pred).collect()
    }
    assert cells == {("PER", "ORG"): 1, ("LOC", "O"): 1, ("O", "DAT"): 1}


def test_empty_predictions(spark, gold):
    pred = _df(spark, [])
    p, r = span_pr(gold, pred)
    assert p == 0.0 and r == 0.0


def test_bio_tags_and_token_confusion(spark):
    """Token-level confusion analog of ref src/training.py:195-207:
    paragraph 'João Silva mora em Lisboa' tokens at known offsets;
    gold tags vs predictions with one B/I switch and one missed LOC."""
    from portuguese_pt_legal_ner_spark.operators.metrics import (
        bio_tags,
        token_confusion_matrix,
    )

    tokens = spark.createDataFrame(
        [
            ("c1", 0, 0, 0, 0, 4),    # João
            ("c1", 0, 0, 1, 5, 10),   # Silva
            ("c1", 0, 0, 2, 11, 15),  # mora
            ("c1", 0, 0, 3, 16, 18),  # em
            ("c1", 0, 0, 4, 19, 25),  # Lisboa
        ],
        "conv_id string, turn_idx int, para_idx int, token_idx int, start int, end int",
    )
    gold_m = _df(spark, [("c1", 0, 0, 0, 10, "PER"), ("c1", 0, 0, 19, 25, "LOC")])
    pred_m = _df(spark, [("c1", 0, 0, 0, 10, "PER")])  # LOC missed

    gold_tags = bio_tags(gold_m, tokens)
    got = {r["token_idx"]: r["tag"] for r in gold_tags.collect()}
    assert got == {0: "B-PER", 1: "I-PER", 2: "O", 3: "O", 4: "B-LOC"}

    cm = {
        (r["gold_tag"], r["pred_tag"]): r["n"]
        for r in token_confusion_matrix(gold_tags, bio_tags(pred_m, tokens)).collect()
    }
    assert cm == {
        ("B-PER", "B-PER"): 1,
        ("I-PER", "I-PER"): 1,
        ("O", "O"): 2,
        ("B-LOC", "O"): 1,
    }


def test_confusion_artifact_writer(spark, tmp_path):
    from portuguese_pt_legal_ner_spark.operators.metrics import (
        save_confusion_artifact,
        token_confusion_matrix,
    )

    tags = spark.createDataFrame(
        [("c1", 0, 0, 0, "B-PER"), ("c1", 0, 0, 1, "O")],
        "conv_id string, turn_idx int, para_idx int, token_idx int, tag string",
    )
    path = save_confusion_artifact(token_confusion_matrix(tags, tags), str(tmp_path / "cm"))
    text = open(path).read().splitlines()
    assert text[0] == "gold\\pred,B-PER,O"
    assert text[1] == "B-PER,1,0"
    assert text[2] == "O,0,1"


def test_confusion_png_written_without_matplotlib(spark, tmp_path):
    """The PNG artifact exists in every environment: with matplotlib
    absent (this sandbox) the stdlib encoder writes a structurally
    valid PNG — signature, IHDR dimensions matching the label grid,
    decompressible IDAT with one filter byte per scanline."""
    import struct
    import zlib

    from portuguese_pt_legal_ner_spark.operators.metrics import (
        save_confusion_artifact,
        token_confusion_matrix,
    )

    schema = ("conv_id string, turn_idx int, para_idx int, "
              "token_idx int, tag string")
    tags = spark.createDataFrame(
        [("c1", 0, 0, 0, "B-PER"), ("c1", 0, 0, 1, "O"),
         ("c1", 0, 0, 2, "B-LOC")],
        schema,
    )
    pred = spark.createDataFrame(
        [("c1", 0, 0, 0, "B-PER"), ("c1", 0, 0, 1, "B-LOC"),
         ("c1", 0, 0, 2, "B-LOC")],
        schema,
    )
    csv_path = save_confusion_artifact(
        token_confusion_matrix(tags, pred), str(tmp_path / "cm")
    )
    png_path = csv_path.replace(".csv", ".png")
    data = open(png_path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    n_labels = len(open(csv_path).readline().strip().split(",")) - 1
    assert w == h == n_labels * 24 + 1
    # IDAT payload decompresses to h scanlines of 1 filter byte + 3w px
    idat_off = data.index(b"IDAT")
    (idat_len,) = struct.unpack(">I", data[idat_off - 4 : idat_off])
    raw = zlib.decompress(data[idat_off + 4 : idat_off + 4 + idat_len])
    assert len(raw) == h * (1 + 3 * w)
    assert data.endswith(
        b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )
