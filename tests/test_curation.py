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


def test_curation_composed_plan_shape_is_skew_immune(spark):
    """Pin the dedup-keep plan shape: a map-side-combined min-aggregate
    plus a join whose keys Catalyst infers to the COMPOSITE
    (md5(text), doc_id) — unique on both sides, so NO exchange in the
    pipeline can be skewed by an exact-dup flood. This is deliberate:
    the window-min-over-md5(text) formulation has one fewer exchange
    but funnels a whole flood through one unsplittable window
    partition. Exchanges: big side (hash, id), slim mins re-shuffle,
    slim agg partial, packing window = 4, only one of which carries
    the text payload."""
    docs = _docs(
        spark,
        [(i, f"varied content tokens document {i} with enough words " * 2)
         for i in range(50)],
    )
    plan = curate_corpus(docs, quality_threshold=0.3)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 4, plan
    assert "partial_min" in plan  # flood collapses BEFORE the shuffle
    # the inferred composite join keys — the skew-immunity certificate
    assert "doc_id" in plan.split("SortMergeJoin")[1].split("\n")[0]


def test_curation_exact_dup_flood_is_deduped(spark):
    """A planted flood of byte-identical docs collapses to its min id
    through the skew-safe agg+semi-join (the map-side combine keeps the
    flood off any single reducer)."""
    body = "varied flood document body with plenty of words here " * 2
    flood = [(i, body) for i in range(100, 1100)]
    normal = [(1, "a broad mixture of longer distinct tokens flowing naturally " * 2)]
    docs = _docs(spark, normal + flood)
    out = {r["doc_id"] for r in curate_corpus(docs, quality_threshold=0.0).collect()}
    assert out == {1, 100}


def test_run_curate_cli_scrub_spans(spark, tmp_path):
    """CLI: --scrub-spans excises cross-document duplicated regions
    BEFORE curation and reports tokens_scrubbed — the composed
    boilerplate-removal + curation pipeline in one subprocess run."""
    import json as _json
    import subprocess
    import sys as _sys

    inp, outdir = str(tmp_path / "in"), str(tmp_path / "packed")
    B = " ".join(f"boiler{i}" for i in range(10))
    rows = [
        (1, f"{B} some distinct legal narrative one " + "alpha beta " * 20),
        (2, f"{B} entirely different narrative two " + "gamma delta " * 20),
        (3, "unique document with no shared region " + "epsilon zeta " * 20),
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(inp)
    proc = subprocess.run(
        [
            _sys.executable, "jobs/run_curate.py",
            "--input", inp, "--output", outdir,
            "--quality", "0.0", "--scrub-spans",
            "--budget", "64", "--shards", "2", "--master", "local[2]",
        ],
        capture_output=True, text=True, cwd="/root/repo", check=True,
        timeout=300,
    )
    stats = _json.loads(proc.stdout.strip().splitlines()[-1])
    # the 10-token boilerplate run is cut from BOTH carriers
    assert stats["tokens_scrubbed"] == 20
    assert stats["kept_docs"] == 3 and stats["chunks"] > 0
