"""Bucketing plan-shape proof: the README's scale claim — "with the
table bucketed by the key, the window/join exchanges collapse to local
sorts" — asserted from the physical plan, not narrative.

On a real deployment the KG stage outputs are bucketed Iceberg tables;
this sandbox has no Iceberg, so the mechanism is demonstrated with
Spark managed bucketed tables (same planner rule: a bucketed scan
reports HashPartitioning on the bucket key, which satisfies the
window's / join's required distribution, so EnsureRequirements inserts
no Exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    df = spark.range(2000).select(
        (F.col("id") % 100).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") * 7 % 97).alias("value"),
    )
    df.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
        "bucketdb.events_bucketed"
    )
    df.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
        "bucketdb.users_bucketed"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketdb.events_bucketed")
    spark.sql("DROP TABLE IF EXISTS bucketdb.users_bucketed")
    spark.sql("DROP DATABASE IF EXISTS bucketdb")


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # disable the broadcast fallback: at dim-table sizes AQE prefers a
    # BroadcastHashJoin (and rightly so), but the claim under test is
    # the co-located SHUFFLE-FREE merge join a 100-TB fact-fact join
    # relies on, where neither side broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bucketdb.events_bucketed")
        b = spark.table("bucketdb.users_bucketed").groupBy("user_id").agg(
            F.sum("value").alias("total")
        )
        plan = _executed(a.join(b, "user_id").filter(F.col("total") >= 0))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_window_has_no_shuffle(spark, bucketed):
    w = Window.partitionBy("user_id").orderBy("event_id")
    plan = _executed(
        spark.table("bucketdb.events_bucketed")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Window" in plan


def test_unbucketed_baseline_does_shuffle(spark, bucketed, tmp_path):
    """Control: the SAME query over a plain parquet copy pays the
    hash exchange the bucketed layout eliminates."""
    path = str(tmp_path / "plain")
    spark.table("bucketdb.events_bucketed").write.mode("overwrite").parquet(path)
    w = Window.partitionBy("user_id").orderBy("event_id")
    plan = _executed(
        spark.read.parquet(path)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    assert "Exchange hashpartitioning(user_id" in plan
