"""Small-file compaction: fewer files, identical content, key-clustered
output when sorted."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.operators.maintenance import (
    compact_parquet,
    dir_bytes,
)


def _parts(path: str) -> list[str]:
    return sorted(glob.glob(f"{path}/part-*.parquet"))


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(40).write.parquet(src)  # simulate small-file accretion
    assert len(_parts(src)) == 40
    n = compact_parquet(spark, src, dst, target_mb=128)
    assert n == 1 and len(_parts(dst)) == 1  # tiny table -> one file
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b  # row-for-row identical


def test_compact_sorted_files_are_key_clustered(spark, tmp_path):
    """With sort_by, output files cover DISJOINT key ranges (range
    exchange) and are internally sorted — file-level AND row-group
    min/max stats stay tight for data skipping."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(16).write.parquet(src)
    # force multiple output files on a tiny table: fractional target
    # ~ one third of the source bytes
    target_mb = dir_bytes(spark, src) / (3 * 1024 * 1024)
    compact_parquet(spark, src, dst, target_mb=target_mb, sort_by=["doc_id"])
    parts = _parts(dst)
    assert len(parts) >= 2
    ranges = []
    for p in parts:
        ids = [r["doc_id"] for r in spark.read.parquet(p).collect()]
        assert ids == sorted(ids)  # internally sorted
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # disjoint key ranges across files


def test_compact_empty_sort_is_round_robin(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(1000).withColumn("payload", F.lit("x" * 100)).repartition(
        25
    ).write.parquet(src)
    compact_parquet(spark, src, dst, target_mb=1024)
    assert spark.read.parquet(dst).count() == 1000
