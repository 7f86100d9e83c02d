"""spark-submit entrypoint for table compaction.

    spark-submit --py-files /tmp/pkg.zip jobs/run_compact.py \
        --input <parquet_dir> --output <parquet_dir> \
        [--target-mb 128] [--sort-by doc_id[,col2]]

Rewrites a small-file-accreted table directory into ~target-mb files,
optionally range-clustered + sorted on the given keys (tight file- and
row-group-level min/max stats for data skipping). Prints one JSON line
with before/after file counts and byte size.

Local smoke (this sandbox):
    python jobs/run_compact.py --input /tmp/some_table --output /tmp/compacted \
        --sort-by doc_id --master 'local[2]'
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--target-mb", type=float, default=128)
    parser.add_argument("--sort-by", default=None,
                        help="comma-separated range-cluster/sort keys")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from portuguese_pt_legal_ner_spark.operators.maintenance import (
        compact_parquet,
        count_part_files,
        dir_bytes,
    )
    from portuguese_pt_legal_ner_spark.session import build_session

    spark = build_session(app_name="compact", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    # Hadoop FS, not local glob: the counts must be right on
    # HDFS/S3A URIs too, same abstraction as dir_bytes
    before_files = count_part_files(spark, args.input)
    before_bytes = dir_bytes(spark, args.input)
    sort_by = args.sort_by.split(",") if args.sort_by else None
    n = compact_parquet(
        spark, args.input, args.output, args.target_mb, sort_by
    )
    print(json.dumps({
        "input_files": before_files, "input_bytes": before_bytes,
        "output_files": n, "target_mb": args.target_mb,
        "sort_by": sort_by, "out": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
