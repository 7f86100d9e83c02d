"""spark-submit entrypoint for the KG pipeline (north_rule deploy shape).

Cluster:
    python -m zipfile -c /tmp/pkg.zip portuguese_pt_legal_ner_spark
    spark-submit --py-files /tmp/pkg.zip \
        --conf spark.sql.adaptive.enabled=true \
        jobs/run_pipeline.py --input <transcripts_parquet_or_table> \
        --workdir <output_dir> [--alias-dict builtin] [--resume]

Local smoke (this sandbox):
    python jobs/run_pipeline.py --synthetic 200 --workdir /tmp/kg_out

Re-running with the same --workdir resumes: completed stages are
skipped (KGPipeline checkpoints), making the job idempotent under
retry/restart — the north_rule's resumability contract.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", help="transcripts parquet path")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic conversations instead of --input")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--alias-dict", default="builtin",
                        choices=["builtin", "none"])
    parser.add_argument("--master", default=None)
    parser.add_argument("--salt-buckets", type=int, default=16)
    args = parser.parse_args()

    from portuguese_pt_legal_ner_spark.operators.tracking import RunTracker
    from portuguese_pt_legal_ner_spark.plans.pipeline import KGPipeline
    from portuguese_pt_legal_ner_spark.session import build_session
    from portuguese_pt_legal_ner_spark.sources.tables import (
        alias_dict_df,
        distributed_transcripts,
    )

    spark = build_session(app_name="kg-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        transcripts = distributed_transcripts(spark, args.synthetic, seed=42)
        input_desc = f"<synthetic n={args.synthetic} seed=42>"
    elif args.input:
        transcripts = spark.read.parquet(args.input)
        input_desc = args.input
    else:
        parser.error("need --input or --synthetic")

    run_id = args.run_id or f"run-{int(time.time())}"
    from datetime import datetime, timezone

    tracker = RunTracker(spark, f"{args.workdir}/_runs")
    start = datetime.now(timezone.utc)
    tracker.record_run(run_id, "kg-pipeline", "inference", "running", start,
                       config=vars(args))

    pipeline = KGPipeline(spark, args.workdir, run_id=run_id)
    alias = alias_dict_df(spark) if args.alias_dict == "builtin" else None
    out = pipeline.run(transcripts, alias_dict=alias,
                       transcripts_path=input_desc,
                       salt_buckets=args.salt_buckets)

    counts = {name: df.count() for name, df in out.items()}
    for name, n in counts.items():
        tracker.log_metric(run_id, name, "rows_out", n)
    tracker.record_run(run_id, "kg-pipeline", "inference", "completed",
                       start, datetime.now(timezone.utc), config=vars(args))
    print({"run_id": run_id, **counts})
    spark.stop()


if __name__ == "__main__":
    main()
