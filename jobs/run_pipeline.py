"""spark-submit entrypoint for the KG pipeline (north_rule deploy shape).

Cluster:
    python -m zipfile -c /tmp/pkg.zip portuguese_pt_legal_ner_spark
    spark-submit --py-files /tmp/pkg.zip \
        --conf spark.sql.adaptive.enabled=true \
        jobs/run_pipeline.py --input <transcripts_parquet_or_table> \
        --workdir <output_dir> [--alias-dict builtin] [--resume]

Local smoke (this sandbox):
    python jobs/run_pipeline.py --synthetic 200 --workdir /tmp/kg_out

YAML-driven (reference UX parity — ConfigManager.load_inference_config,
ref src/config.py:254-281; see configs/inference_kg.yaml):
    python jobs/run_pipeline.py --config configs/inference_kg.yaml

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
    parser.add_argument("--config", default=None,
                        help="YAML experiment config (reference UX parity: "
                        "ConfigManager.load_inference_config, "
                        "ref src/config.py:254-281); CLI flags override it")
    parser.add_argument("--input", help="transcripts parquet path")
    parser.add_argument("--synthetic", type=int, default=None,
                        help="generate N synthetic conversations instead of --input")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--alias-dict", default=None,
                        choices=["builtin", "none"])
    parser.add_argument("--master", default=None)
    parser.add_argument("--salt-buckets", type=int, default=None)
    parser.add_argument("--confidence-threshold", type=float, default=None)
    parser.add_argument("--checkpoint-dir", default=None,
                        help="reliable-checkpoint dir (HDFS/object store) "
                        "for the CC iterations; default localCheckpoint is "
                        "unrecoverable on executor loss (config: "
                        "kg.checkpoint_dir)")
    args = parser.parse_args()

    if args.input and args.synthetic:
        # both sources given explicitly: refuse instead of silently
        # picking one (round-3 advice — the precedence between the two
        # flipped once already, breaking invocations that passed both)
        parser.error("--input and --synthetic are mutually exclusive; "
                     "pass exactly one input source")

    exp_name = "kg-pipeline"
    confidence = 0.5
    if args.config:
        from portuguese_pt_legal_ner_spark.config import load_inference_config

        cfg = load_inference_config(args.config)
        exp_name = cfg.experiment_name
        confidence = cfg.inference.confidence_threshold
        args.input = args.input or (cfg.inference.input_file or None)
        # explicit CLI flags beat config: an explicit --input suppresses
        # config synthetic_conversations, and --synthetic 0 is a real
        # override, not a fall-through (round-2 advice)
        if args.synthetic is None and not args.input:
            args.synthetic = cfg.kg.synthetic_conversations
        args.workdir = args.workdir or (cfg.kg.workdir or None)
        args.alias_dict = args.alias_dict or cfg.kg.alias_dict
        args.master = args.master or cfg.kg.master
        if args.salt_buckets is None:
            args.salt_buckets = cfg.kg.salt_buckets
        args.checkpoint_dir = args.checkpoint_dir or (cfg.kg.checkpoint_dir or None)
    if args.confidence_threshold is not None:
        confidence = args.confidence_threshold
    args.alias_dict = args.alias_dict or "builtin"
    args.salt_buckets = 16 if args.salt_buckets is None else args.salt_buckets
    if not args.workdir:
        parser.error("need --workdir (flag or config kg.workdir)")

    from portuguese_pt_legal_ner_spark.operators.tracking import RunTracker
    from portuguese_pt_legal_ner_spark.plans.pipeline import KGPipeline
    from portuguese_pt_legal_ner_spark.session import build_session
    from portuguese_pt_legal_ner_spark.sources.tables import (
        alias_dict_df,
        distributed_transcripts,
    )

    spark = build_session(app_name=exp_name, master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        transcripts = spark.read.parquet(args.input)
        input_desc = args.input
    elif args.synthetic:
        transcripts = distributed_transcripts(spark, args.synthetic, seed=42)
        input_desc = f"<synthetic n={args.synthetic} seed=42>"
    else:
        parser.error("need --input or --synthetic")

    run_id = args.run_id or f"run-{int(time.time())}"
    from datetime import datetime, timezone

    tracker = RunTracker(spark, f"{args.workdir}/_runs")
    start = datetime.now(timezone.utc)
    tracker.record_run(run_id, exp_name, "inference", "running", start,
                       config=vars(args))

    pipeline = KGPipeline(spark, args.workdir, run_id=run_id)
    alias = alias_dict_df(spark) if args.alias_dict == "builtin" else None
    out = pipeline.run(transcripts, alias_dict=alias,
                       transcripts_path=input_desc,
                       salt_buckets=args.salt_buckets,
                       confidence_threshold=confidence,
                       checkpoint_dir=args.checkpoint_dir)

    counts = {name: df.count() for name, df in out.items()}
    for name, n in counts.items():
        tracker.log_metric(run_id, name, "rows_out", n)
    tracker.record_run(run_id, exp_name, "inference", "completed",
                       start, datetime.now(timezone.utc), config=vars(args))
    print({"run_id": run_id, **counts})
    spark.stop()


if __name__ == "__main__":
    main()
