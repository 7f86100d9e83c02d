"""Run-tracking table tests (reference tracking.py semantics)."""

from __future__ import annotations

from datetime import datetime

from portuguese_pt_legal_ner_spark.operators.tracking import RunTracker


def test_upsert_last_writer_wins(spark, tmp_path):
    tr = RunTracker(spark, str(tmp_path))
    t0 = datetime(2024, 1, 1, 8, 0, 0)
    t1 = datetime(2024, 1, 1, 9, 30, 45)
    tr.record_run("r1", "ner-infer", "inference", "running", t0)
    tr.record_run("r2", "train", "training", "running", t0)
    tr.record_run("r1", "ner-infer", "inference", "completed", t0, t1)

    runs = {r["run_id"]: r for r in tr.runs().collect()}
    assert len(runs) == 2
    assert runs["r1"]["status"] == "completed"
    assert runs["r2"]["status"] == "running"


def test_list_sorted_desc_and_lookup(spark, tmp_path):
    tr = RunTracker(spark, str(tmp_path))
    tr.record_run("a", "x", "t", "done", datetime(2024, 1, 1))
    tr.record_run("b", "y", "t", "done", datetime(2024, 2, 1))
    ids = [r["run_id"] for r in tr.list_runs().collect()]
    assert ids == ["b", "a"]  # start_time desc (tracking.py:528-531)
    assert tr.get_run("a").count() == 1


def test_duration_seconds(spark, tmp_path):
    tr = RunTracker(spark, str(tmp_path))
    tr.record_run(
        "r", "x", "t", "done",
        datetime(2024, 1, 1, 8, 0, 0), datetime(2024, 1, 1, 9, 30, 45),
    )
    row = tr.with_duration().collect()[0]
    assert row["duration_sec"] == 5445  # 1h30m45s


def test_metrics_append_and_summary(spark, tmp_path):
    tr = RunTracker(spark, str(tmp_path))
    for v in (10.0, 20.0, 30.0):
        tr.log_metric("r", "mentions", "rows_per_sec", v)
    s = tr.summary().collect()[0]
    assert s["avg_value"] == 20.0 and s["max_value"] == 30.0 and s["n_points"] == 3
