"""Composed corpus-curation pipeline (plans/curation.py): dedup keep →
quality gate → deterministic sample → packing, as one lazy plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.plans.curation import curate_corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_dedup_keeps_min_id(spark):
    """Byte-identical texts collapse to the MIN doc_id (the
    exact_dedup representative rule) before any later stage sees
    them."""
    body = "a diverse selection of reasonably long words here " * 3
    docs = _docs(spark, [(5, body), (2, body), (9, body), (7, body + "unique tail")])
    out = {r["doc_id"] for r in curate_corpus(docs, quality_threshold=0.0).collect()}
    assert out == {2, 7}  # 2 = min of {5,2,9}; 7 survives as distinct


def test_curation_quality_gate_drops_low_quality(spark):
    """Punctuation soup / zero-diversity docs fall below the gate while
    normal prose passes."""
    good = "a broad mixture of longer distinct tokens flowing naturally " * 2
    soup = ".,;:!? .,;:!? .,;:!? .,;:!?"
    repeat = "spam " * 40
    docs = _docs(spark, [(1, good), (2, soup), (3, repeat)])
    out = {r["doc_id"] for r in curate_corpus(docs, quality_threshold=0.5).collect()}
    assert 1 in out
    assert 2 not in out and 3 not in out


def test_curation_sample_is_deterministic_subset(spark):
    rows = [(i, f"document body with varied tokens number {i} extended " * 2)
            for i in range(200)]
    docs = _docs(spark, rows)
    full = {r["doc_id"] for r in curate_corpus(docs, quality_threshold=0.0).collect()}
    half_a = {r["doc_id"] for r in
              curate_corpus(docs, quality_threshold=0.0, sample_fraction=0.5).collect()}
    half_b = {r["doc_id"] for r in
              curate_corpus(docs, quality_threshold=0.0, sample_fraction=0.5).collect()}
    assert half_a == half_b          # pure function of (key, config)
    assert half_a < full             # a strict, keyed subset
    assert 0.25 * len(full) < len(half_a) < 0.75 * len(full)


def test_curation_packs_long_docs_in_chunks(spark):
    long_doc = " ".join(f"tok{i}" for i in range(150))
    docs = _docs(spark, [(1, long_doc)])
    out = curate_corpus(docs, quality_threshold=0.0, budget=64).collect()
    chunks = sorted((r["chunk_idx"], r["n_tokens"]) for r in out)
    assert chunks == [(0, 64), (1, 64), (2, 22)]
    assert all(r["n_tokens"] <= 64 for r in out)


def test_curation_single_composed_plan_two_shuffles(spark):
    """The pipeline composes into ONE plan whose only exchanges are the
    dedup window's md5 hash-partitioning and the packing window's
    shard partitioning — the quality/sample filters ride those stages
    free (no extra shuffle, no materialization barrier)."""
    docs = _docs(
        spark,
        [(i, f"varied content tokens document {i} with enough words " * 2)
         for i in range(50)],
    )
    plan = curate_corpus(docs, quality_threshold=0.3)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, plan
