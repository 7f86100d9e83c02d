"""spark-submit entrypoint for the Structured Streaming jobs.

Each mode is an AvailableNow catch-up job over a growing input
directory — run it from cron/Airflow and it processes unseen files,
updates its state in the checkpoint, and exits; state (watermarks,
dedup keys, open sessions, near-dup band buckets) survives between
runs. Swap the trigger for a continuous one in a long-running driver.

    spark-submit --py-files /tmp/pkg.zip jobs/run_stream.py <mode> \
        --input <dir> --output <dir> --checkpoint <dir> [options]

Modes:
    windowed  — watermarked tumbling event-time window counts (events)
    sessions  — stateful user sessionization, gap + timeout close (events)
    dedup     — watermark-bounded exact key dedup (events)
    neardup   — in-stream simhash near-dup pairing, star-capped
                watermark-bounded bucket state (documents with ts)
    curate    — streaming corpus curation: watermark-bounded exact
                text dedup + quality gate + deterministic sample
                (documents with ts); --pack-output additionally runs
                the periodic batch token-bin pack over the whole
                curated sink after catch-up (the lambda-split last
                mile; see streaming/curation.pack_curated_sink)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


_DELAY_UNITS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _parse_delay_sec(delay: str) -> int:
    """'10 minutes' → 600. Supports the interval forms the watermark
    accepts (N second/minute/hour/day/week[s])."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-z]+?)s?\s*", delay.lower())
    if not m or m.group(2) not in _DELAY_UNITS:
        raise ValueError(f"cannot parse watermark delay {delay!r}")
    return int(m.group(1)) * _DELAY_UNITS[m.group(2)]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["windowed", "sessions", "dedup", "neardup", "curate"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--window", default="10 minutes")
    parser.add_argument("--delay", default="10 minutes",
                        help="watermark delay (late-data allowance)")
    parser.add_argument("--gap-sec", type=int, default=1800)
    parser.add_argument("--keys", default="event_id",
                        help="comma-separated dedup keys (dedup mode)")
    parser.add_argument("--max-hamming", type=int, default=3)
    parser.add_argument("--n-bands", type=int, default=4)
    parser.add_argument("--delay-sec", type=int, default=None,
                        help="near-dup state horizon in seconds; default "
                        "derived from --delay so the watermark and the "
                        "bucket prune/timeout horizon always agree")
    parser.add_argument("--quality", type=float, default=0.55,
                        help="curate mode: quality_score gate")
    parser.add_argument("--fraction", type=float, default=1.0,
                        help="curate mode: deterministic sample fraction")
    parser.add_argument("--pack-output", default=None,
                        help="curate mode: after the stream catches up, "
                        "batch-pack EVERYTHING the sink has admitted so "
                        "far into token bins and overwrite this dir (the "
                        "batch half of the curation lambda split)")
    parser.add_argument("--budget", type=int, default=2048,
                        help="curate mode: token budget per packed bin")
    parser.add_argument("--shards", type=int, default=16,
                        help="curate mode: packing shards")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from portuguese_pt_legal_ner_spark.session import build_session

    spark = build_session(app_name=f"stream-{args.mode}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.mode == "windowed":
        from portuguese_pt_legal_ner_spark.streaming.windowed import (
            stream_windowed_counts,
        )

        stream_windowed_counts(spark, args.input, args.output,
                               args.checkpoint, args.window, args.delay)
    elif args.mode == "sessions":
        from portuguese_pt_legal_ner_spark.streaming.sessions import (
            stream_user_sessions,
        )

        stream_user_sessions(spark, args.input, args.output,
                             args.checkpoint, args.gap_sec, args.delay)
    elif args.mode == "dedup":
        from portuguese_pt_legal_ner_spark.streaming.dedup import stream_dedup

        stream_dedup(spark, args.input, args.output, args.checkpoint,
                     keys=tuple(args.keys.split(",")), delay=args.delay)
    elif args.mode == "curate":
        from portuguese_pt_legal_ner_spark.streaming.curation import (
            stream_curate,
        )

        stream_curate(
            spark, args.input, args.output, args.checkpoint,
            quality_threshold=args.quality, sample_fraction=args.fraction,
            delay=args.delay,
        )
        if args.pack_output:
            from portuguese_pt_legal_ner_spark.streaming.curation import (
                pack_curated_sink,
            )

            packed = pack_curated_sink(
                spark, args.output, budget=args.budget, shards=args.shards
            )
            # overwrite, not append: bin assignment is a function of
            # the WHOLE curated set, so each periodic pack supersedes
            # the previous one (appending would duplicate every chunk)
            packed.write.mode("overwrite").parquet(args.pack_output)
            out = spark.read.parquet(args.pack_output)
            print(json.dumps({
                "packed_chunks": out.count(),
                "packed_bins": out.select("bin_id").distinct().count(),
                "pack_output": args.pack_output,
            }))
    else:
        from portuguese_pt_legal_ner_spark.streaming.neardup import (
            stream_neardup_pairs,
        )

        delay_sec = (
            args.delay_sec if args.delay_sec is not None
            else _parse_delay_sec(args.delay)
        )
        stream_neardup_pairs(
            spark, args.input, args.output, args.checkpoint,
            max_hamming=args.max_hamming, n_bands=args.n_bands,
            delay=args.delay, delay_sec=delay_sec,
        )
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"mode": args.mode, "output_rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
