"""Table-maintenance ops: small-file compaction.

A long-running ingest (streaming sinks, per-increment appends, hourly
crawl drops) accretes thousands of small parquet files; at 100 TB the
resulting scan pays per-file open cost, floods the driver with file
listings, and defeats row-group min/max skipping. Compaction rewrites
a table directory into ~`target_mb`-sized files — optionally
range-clustered on sort keys so every output file covers a tight key
range and predicate pushdown can skip whole files (the poor man's
Iceberg `rewrite_data_files` + sort order; on a real lakehouse the
table format's own compaction replaces this).

Scale shapes:
  * file count is derived from the TOTAL BYTE SIZE via the Hadoop
    FileSystem API (works on HDFS/S3A/local alike), never from row
    counts — row width varies wildly across corpora;
  * `sort_by` uses repartitionByRange + sortWithinPartitions: one
    range exchange (sampled boundaries), files come out
    key-clustered AND internally sorted, so both file-level and
    row-group-level min/max stats are tight;
  * without `sort_by`, a plain round-robin repartition balances
    bytes; `coalesce` is deliberately NOT used — it would chain the
    upstream parallelism down and can skew file sizes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of a table directory via the Hadoop FS API
    (engine-portable: local, HDFS, S3A)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def count_part_files(spark: SparkSession, path: str) -> int:
    """Number of part files in a table directory via the Hadoop FS API
    — local glob returns 0 for HDFS/S3A URIs (round-5 advice), so the
    ops-visible file counts must go through the same abstraction
    dir_bytes uses."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path + "/part-*")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return len(fs.globStatus(hpath) or [])


def compact_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    target_mb: float = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite `input_dir` into `output_dir` as ~`target_mb` files;
    returns the part-file count ACTUALLY written (counted post-write —
    a range partitioner can leave partitions empty, so echoing the
    requested count would over-report). Content is preserved
    row-for-row (value-checked by the `maintenance_compact` entry
    oracle)."""
    total = dir_bytes(spark, input_dir)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(input_dir)
    if sort_by:
        out: DataFrame = df.repartitionByRange(n_files, *sort_by)
        out = out.sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(output_dir)
    return count_part_files(spark, output_dir)
