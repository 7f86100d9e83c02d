"""Evaluation metrics as Spark joins/aggregations.

Re-expresses the reference's seqeval-based compute_metrics
(src/training.py:46-101: argmax → mask -100 → entity-level P/R/F1 +
per-type classification report) over mentions TABLES instead of label
sequences: seqeval's entity-level semantics are exactly "exact-span,
exact-type match", i.e. an equi-join between gold and predicted
mention tables on (conv_id, turn_idx, para_idx, start, end, label)
(SURVEY §2.4 A1).

`classification_report`: per-label precision/recall/F1/support plus
the micro average — the reference's per-type report + micro row
(src/training.py:81-99) via a single GROUP BY + a grand-total union
(a rollup, SURVEY §2.6).

`confusion_matrix`: span-level analog of training.py:195-207 — spans
matched on position but not label are (gold_label, pred_label) cells;
unmatched gold spans are (label, 'O'); unmatched predictions are
('O', label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEYS = ["conv_id", "turn_idx", "para_idx", "start", "end"]


def classification_report(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """(label, precision, recall, f1, support) per label + '__micro__'."""
    tp = (
        gold.select(*SPAN_KEYS, "label")
        .join(pred.select(*SPAN_KEYS, "label"), SPAN_KEYS + ["label"])
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    gold_counts = gold.groupBy("label").agg(F.count(F.lit(1)).alias("support"))
    pred_counts = pred.groupBy("label").agg(F.count(F.lit(1)).alias("n_pred"))

    per_label = (
        gold_counts.join(pred_counts, "label", "full")
        .join(tp, "label", "left")
        .na.fill(0, ["tp", "support", "n_pred"])
    )
    totals = per_label.agg(
        F.lit("__micro__").alias("label"),
        F.sum("support").alias("support"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("tp").alias("tp"),
    )
    all_rows = per_label.unionByName(totals)
    precision = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0)
    return all_rows.select(
        "label",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(
            F.when(
                (precision + recall) > 0,
                2 * precision * recall / (precision + recall),
            ).otherwise(0.0),
            6,
        ).alias("f1"),
        F.col("support").cast("long").alias("support"),
    )


def span_pr(gold: DataFrame, pred: DataFrame) -> tuple[float, float]:
    """Scalar micro precision/recall — the BASELINE P/R≥0.95 gate."""
    row = (
        classification_report(gold, pred)
        .filter(F.col("label") == "__micro__")
        .collect()[0]
    )
    return float(row["precision"]), float(row["recall"])


def confusion_matrix(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """(gold_label, pred_label, n) span-level confusion counts."""
    g = gold.select(*SPAN_KEYS, F.col("label").alias("gold_label"))
    p = pred.select(*SPAN_KEYS, F.col("label").alias("pred_label"))
    matched = g.join(p, SPAN_KEYS, "full").select(
        F.coalesce(F.col("gold_label"), F.lit("O")).alias("gold_label"),
        F.coalesce(F.col("pred_label"), F.lit("O")).alias("pred_label"),
    )
    return matched.groupBy("gold_label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )


TOKEN_KEYS = ["conv_id", "turn_idx", "para_idx", "token_idx"]


def bio_tags(mentions: DataFrame, tokens: DataFrame) -> DataFrame:
    """Token table + mention spans → per-token BIO tags.

    `tokens`: (conv_id, turn_idx, para_idx, token_idx, start, end) —
    the tokenizer's offsets table. A token is tagged B-<label> when it
    begins a mention span (token.start == span.start), I-<label> when
    it lies inside one, else 'O' — the flattened label-sequence shape
    the reference feeds sklearn (ref src/training.py:195-207). Range
    predicate is a join within the same paragraph keys, so it stays an
    equi-join on the paragraph with a post-filter — no cross product.
    """
    span = mentions.select(
        "conv_id", "turn_idx", "para_idx",
        F.col("start").alias("m_start"),
        F.col("end").alias("m_end"),
        "label",
    )
    tagged = (
        tokens.join(span, ["conv_id", "turn_idx", "para_idx"], "left")
        .filter(
            F.col("m_start").isNull()
            | ((F.col("start") >= F.col("m_start")) & (F.col("end") <= F.col("m_end")))
        )
        .withColumn(
            "tag",
            F.when(F.col("m_start").isNull(), F.lit("O"))
            .when(F.col("start") == F.col("m_start"), F.concat(F.lit("B-"), "label"))
            .otherwise(F.concat(F.lit("I-"), "label")),
        )
    )
    # a token outside every span loses all its join partners to the
    # filter only when spans existed for the paragraph — recover those
    # as 'O' by re-joining the full token spine
    spine = tokens.select(*TOKEN_KEYS)
    got = tagged.groupBy(*TOKEN_KEYS).agg(F.min("tag").alias("tag"))
    return (
        spine.join(got, TOKEN_KEYS, "left")
        .select(*TOKEN_KEYS, F.coalesce("tag", F.lit("O")).alias("tag"))
    )


def token_confusion_matrix(gold_tags: DataFrame, pred_tags: DataFrame) -> DataFrame:
    """(gold_tag, pred_tag, n) token-level confusion counts — the
    faithful analog of the reference's sklearn confusion_matrix over
    flattened BIO sequences (ref src/training.py:195-207): sequences
    are position-aligned, so the flatten+zip is an equi-join on
    (paragraph keys, token_idx) and the matrix is one GROUP BY."""
    g = gold_tags.select(*TOKEN_KEYS, F.col("tag").alias("gold_tag"))
    p = pred_tags.select(*TOKEN_KEYS, F.col("tag").alias("pred_tag"))
    return (
        g.join(p, TOKEN_KEYS, "full")
        .select(
            F.coalesce("gold_tag", F.lit("O")).alias("gold_tag"),
            F.coalesce("pred_tag", F.lit("O")).alias("pred_tag"),
        )
        .groupBy("gold_tag", "pred_tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _write_png_heatmap(path: str, mat: list[list[int]], cell: int = 24) -> None:
    """Minimal PNG heatmap with NOTHING beyond the stdlib (zlib +
    struct): the PNG container is four chunks (IHDR, one zlib-deflated
    IDAT of filter-prefixed scanlines, IEND). Each matrix cell renders
    as a `cell`×`cell` block on a white→blue ramp scaled to the matrix
    max, with a 1px grid. Closes the reference's PNG-artifact parity
    (ref src/tracking.py:230-272) without matplotlib; axis labels live
    in the CSV companion."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    n = len(mat)
    peak = max((v for row in mat for v in row), default=0) or 1
    w = h = n * cell + 1
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 per scanline
        for x in range(w):
            if x % cell == 0 or y % cell == 0:
                raw += b"\x80\x80\x80"  # grid line
                continue
            v = mat[y // cell][x // cell] / peak
            # white (0) → saturated blue (1)
            raw += bytes((int(255 * (1 - v)), int(255 * (1 - 0.6 * v)), 255))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
        f.write(chunk(b"IEND", b""))


def save_confusion_artifact(cm: DataFrame, out_path: str) -> str:
    """Confusion-matrix artifact writer (K4 analog of the reference's
    PNG heatmap, ref src/tracking.py:230-272): a CSV grid (labels +
    counts) plus a PNG heatmap — rendered by matplotlib when it is
    installed, else by the stdlib PNG encoder above, so the PNG
    artifact exists in EVERY environment (the round-3 'sandbox-blocked'
    gap, closed)."""
    rows = cm.collect()
    labels = sorted({r["gold_tag"] for r in rows} | {r["pred_tag"] for r in rows})
    grid = {(r["gold_tag"], r["pred_tag"]): r["n"] for r in rows}
    lines = ["gold\\pred," + ",".join(labels)]
    for g in labels:
        lines.append(
            g + "," + ",".join(str(grid.get((g, p), 0)) for p in labels)
        )
    csv_path = out_path if out_path.endswith(".csv") else out_path + ".csv"
    with open(csv_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    mat = [[grid.get((g, p), 0) for p in labels] for g in labels]
    png_path = csv_path.replace(".csv", ".png")
    try:  # pragma: no cover - matplotlib not installed in sandbox
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        fig, ax = plt.subplots()
        ax.imshow(mat)
        ax.set_xticks(range(len(labels)), labels, rotation=90)
        ax.set_yticks(range(len(labels)), labels)
        fig.savefig(png_path, bbox_inches="tight")
        plt.close(fig)
    except ImportError:
        if mat:
            _write_png_heatmap(png_path, mat)
    return csv_path


def triple_pr(gold: DataFrame, pred: DataFrame) -> tuple[float, float]:
    """Triple-level micro P/R on full-row equality (the north_rule's
    'matching the reference's emitted triples' measure)."""
    keys = ["conv_id", "turn_idx", "para_idx", "subj", "pred", "obj"]
    g = gold.select(*keys).dropDuplicates(keys)
    p = pred.select(*keys).dropDuplicates(keys)
    tp = g.join(p, keys).count()
    n_g, n_p = g.count(), p.count()
    return (tp / n_p if n_p else 0.0, tp / n_g if n_g else 0.0)
