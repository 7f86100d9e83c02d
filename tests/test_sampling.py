"""Deterministic sampling + sequence packing (training-data mixing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.operators.sampling import (
    hash_sample,
    pack_token_bins,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_sample_deterministic_and_sized(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.25).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.25).collect()}
    assert a == b  # pure function of the key — retry/re-run safe
    n = docs.count()
    assert 0.1 * n < len(a) < 0.45 * n  # ~25% within md5 uniformity slack


def test_hash_sample_nested_fractions(spark, docs):
    """A smaller fraction is a SUBSET of a larger one (prefix
    thresholds nest) — lets a pipeline scale a sample up without
    invalidating earlier runs."""
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect()}
    assert small <= big


def test_hash_sample_full_fraction_is_identity(spark, docs):
    assert hash_sample(docs, "doc_id", 1.0).count() == docs.count()


def test_pack_token_bins_budget_and_coverage(spark, docs):
    out = pack_token_bins(docs, budget=500, shards=4).collect()
    assert len(out) == docs.count()  # every doc assigned exactly once
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r["n_tokens"])
        assert r["bin_id"] // 1_000_000 == r["shard"]
    for bin_id, toks in by_bin.items():
        # streaming-pack bound: a bin overflows by at most ONE doc
        assert sum(toks) - max(toks) < 500 + max(toks)
        assert sum(toks) < 500 + max(toks)


def test_pack_token_bins_deterministic(spark, docs):
    a = sorted((r["doc_id"], r["bin_id"]) for r in pack_token_bins(docs).collect())
    b = sorted((r["doc_id"], r["bin_id"]) for r in pack_token_bins(docs).collect())
    assert a == b


def test_minhash_md5_dedup_clusters_planted(spark):
    """The SQL-oracled full clustering path: planted near-dups merge,
    singletons stay, representative is the numeric min."""
    from portuguese_pt_legal_ner_spark.operators.dedup import minhash_md5_dedup

    base = "o tribunal da relacao confirmou a sentenca do processo numero "
    rows = [
        (2, base + "um dois tres quatro cinco seis sete oito"),
        (9, base + "um dois tres quatro cinco seis sete oito"),
        (10, base + "um dois tres quatro cinco seis sete NOVE"),
        (40, " ".join(f"token{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_md5_dedup(docs, threshold=0.5).collect()
    }
    assert clusters[2] == clusters[9] == 2  # numeric min, not "10"
    assert clusters[10] == 2
    assert clusters[40] == 40
