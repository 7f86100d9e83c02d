"""Experiment/run tracking as tables (SURVEY §2.1 S5, §2.4 A4-A6,
§2.5 K2-K3).

The reference tracks experiments as experiment.json + metrics.jsonl
files (src/tracking.py:65-148, 393-409), lists them sorted by
start_time desc (tracking.py:528-531), looks them up by id
(tracking.py:533-552), and computes durations from ISO timestamps
(tracking.py:468-496). Re-expressed over a `runs` table (parquet here,
Iceberg `MERGE INTO` in production):

  runs(run_id, name, type, status, start_time, end_time, config json)
  metrics(run_id, stage, key, value, ts)  — append-only

Upserts are last-writer-wins on run_id (the K3 overwrite semantics);
dedup uses a window row_number rather than a driver-side read-modify-
write so concurrent recorders stay safe.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("run_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("config_json", T.StringType()),
        T.StructField("recorded_ts", T.DoubleType()),
    ]
)


class RunTracker:
    """Parquet-backed runs/metrics tables under a workdir."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.runs_path = os.path.join(workdir, "runs.parquet")
        self.metrics_path = os.path.join(workdir, "run_metrics.parquet")
        os.makedirs(workdir, exist_ok=True)

    # K3 analog: experiment.json writer → runs upsert
    def record_run(
        self,
        run_id: str,
        name: str,
        run_type: str,
        status: str,
        start_time,
        end_time=None,
        config: dict | None = None,
    ) -> None:
        row = [
            (
                run_id, name, run_type, status, start_time, end_time,
                json.dumps(config or {}, default=str), time.time(),
            )
        ]
        df = self.spark.createDataFrame(row, RUNS_SCHEMA)
        df.write.mode("append").parquet(self.runs_path)

    # K2 analog: metrics.jsonl appender → append-only metrics table
    def log_metric(self, run_id: str, stage: str, key: str, value: float) -> None:
        df = self.spark.createDataFrame(
            [(run_id, stage, key, float(value), time.time())],
            "run_id string, stage string, key string, value double, ts double",
        )
        df.write.mode("append").parquet(self.metrics_path)

    def runs(self) -> DataFrame:
        """Current state: last write per run_id wins (upsert view)."""
        raw = self.spark.read.parquet(self.runs_path)
        w = Window.partitionBy("run_id").orderBy(F.desc("recorded_ts"))
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "recorded_ts")
        )

    # A5: sort by start_time desc + lookup by id
    def list_runs(self) -> DataFrame:
        return self.runs().orderBy(F.desc("start_time"))

    def get_run(self, run_id: str) -> DataFrame:
        return self.runs().filter(F.col("run_id") == run_id)

    # A6: duration calc (ISO ts diff, µs stripped → whole seconds)
    def with_duration(self) -> DataFrame:
        return self.runs().withColumn(
            "duration_sec",
            (
                F.unix_timestamp("end_time") - F.unix_timestamp("start_time")
            ).cast("long"),
        )

    # A4 analog: throughput rollup per run from the metrics table
    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.metrics_path)

    def summary(self) -> DataFrame:
        return (
            self.metrics()
            .groupBy("run_id", "key")
            .agg(
                F.round(F.avg("value"), 6).alias("avg_value"),
                F.round(F.max("value"), 6).alias("max_value"),
                F.count(F.lit(1)).alias("n_points"),
            )
        )
