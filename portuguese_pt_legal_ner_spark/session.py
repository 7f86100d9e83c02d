"""Tuned SparkSession builders.

One place for the scale-relevant knobs so tests, bench, and the
spark-submit entrypoint agree:

  * AQE on (coalesce partitions, skew-join splitting) — the runtime
    backstop for the planted skew (BASELINE.json north_rule: "skew
    handled explicitly");
  * Arrow execution on, with maxRecordsPerBatch sized to the model
    batch (reference default batch_size=16, max_length=512 —
    src/config.py:61-62 — scaled up since the mock is CPU-cheap);
  * shuffle partitions sized to local cores; on a real cluster this
    is overridden by spark-submit conf (and AQE coalesces anyway).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pt-legal-ner-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = _core_count(master)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Joins: allow shuffled-hash when its size conditions hold and
        # let AQE rewrite sort-merge to shuffled-hash for small
        # post-shuffle partitions (guide §3.1/§9) — the dedup family
        # joins slim aggregate outputs against big spines, where the
        # sort of the big side is pure overhead. Thresholds are
        # per-partition build-side sizes: 64 MB per task is modest on
        # any executor sized for this engine, and AQE skew splitting
        # still applies.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        # The heavy stage is CPU-bound Python over text, not IO: a few
        # MB of compressed transcripts is seconds of NER compute, so
        # input splits and post-shuffle partitions are sized well below
        # the IO-oriented defaults (128m/64m) to keep every core fed —
        # at 100 TB these yield ~16m tasks, still coarse enough that
        # scheduling overhead stays negligible.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "16m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # Whole-stage-codegen class cache: the default 100 entries is
        # far below this engine's working set (each of the ~50 registry
        # queries generates 5-15 codegen classes), so by the time a
        # warmed query runs for real its compiled classes have been
        # evicted by the other queries' and it pays the 3-9 s Janino +
        # C2 first-compile tax AGAIN inside the timed region — as
        # would any long-lived production driver cycling a query mix.
        # Sized to hold the whole registry's classes; cost is bounded
        # JVM metaspace (~KBs per entry).
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local-mode analog of
    ``spark-submit --py-files pkg.zip`` the north_rule mandates).

    Without this, executor Python workers can only import the package
    when the driver happens to run from the repo root. ``addPyFile``
    puts the zip on every executor's sys.path (and the driver's).
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def _core_count(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return 32
