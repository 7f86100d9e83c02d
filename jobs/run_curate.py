"""spark-submit entrypoint for the composed corpus-curation pipeline.

    spark-submit --py-files /tmp/pkg.zip jobs/run_curate.py \
        --input <documents_parquet> --output <parquet_dir> \
        [--quality 0.55] [--fraction 1.0] [--budget 2048] [--shards 16] \
        [--scrub-spans [--span-ngram 8]]

Runs exact-dedup keep → quality gate → deterministic md5 sample →
token packing as ONE plan (plans/curation.py) and writes the packed
(doc_id, chunk_idx, shard, n_tokens, bin_id) assignment. Prints one
JSON line with input/output row counts — the kept fraction is the
ops-visible health signal (a curation run that drops 99% of a crawl
usually means a mis-set threshold, not a bad crawl).

With --from-stream, --input is the curated sink a `run_stream curate`
job appends to: curation is skipped (the stream already deduped, gated,
and sampled) and only the token-bin pack runs — the periodic batch half
of the curation lambda split. Bin assignment is a function of the whole
curated set, so each pack OVERWRITES the previous one.

Local smoke (this sandbox):
    python jobs/run_curate.py --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/curated --master 'local[2]'
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="documents parquet")
    parser.add_argument("--output", required=True, help="output parquet dir")
    parser.add_argument("--quality", type=float, default=0.55,
                        help="quality_score gate (round(score,6) >= q)")
    parser.add_argument("--fraction", type=float, default=1.0,
                        help="deterministic md5-prefix sample fraction")
    parser.add_argument("--budget", type=int, default=2048,
                        help="token budget per packed bin")
    parser.add_argument("--shards", type=int, default=16)
    parser.add_argument("--scrub-spans", action="store_true",
                        help="before curation, excise cross-document "
                        "duplicated token spans (dedup."
                        "scrub_duplicated_spans) — boilerplate regions "
                        "doc-level dedup can't see; reported as "
                        "tokens_scrubbed. Batch-only: ignored under "
                        "--from-stream (the stream sink is already "
                        "curated; tokens_scrubbed prints null)")
    parser.add_argument("--span-ngram", type=int, default=8,
                        help="gram width for --scrub-spans")
    parser.add_argument("--from-stream", action="store_true",
                        help="--input is a curated STREAMING sink "
                        "(already deduped/gated/sampled by run_stream "
                        "curate): skip curation and only pack — the "
                        "periodic batch half of the lambda split")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from portuguese_pt_legal_ner_spark.plans.curation import curate_corpus
    from portuguese_pt_legal_ner_spark.session import build_session

    spark = build_session(app_name="curate", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    tokens_scrubbed = None
    scrubbed = None
    if args.scrub_spans and not args.from_stream:
        from pyspark.sql import functions as F

        from portuguese_pt_legal_ner_spark.operators.dedup import (
            scrub_duplicated_spans,
        )

        # persisted: the tokens_scrubbed aggregate and the curation
        # write both consume the scrub output — without the cache the
        # whole span-detection pipeline (the dominant scan/hash cost)
        # ran twice (round-6 advice)
        scrubbed = scrub_duplicated_spans(docs, n=args.span_ngram).persist()
        tokens_scrubbed = scrubbed.agg(
            F.sum("n_tokens_removed")
        ).first()[0] or 0
        docs = scrubbed.select("doc_id", "text")
    if args.from_stream:
        from portuguese_pt_legal_ner_spark.operators.sampling import (
            pack_token_bins,
        )

        curated = pack_token_bins(
            docs, budget=args.budget, shards=args.shards
        )
    else:
        curated = curate_corpus(
            docs, quality_threshold=args.quality,
            sample_fraction=args.fraction, budget=args.budget,
            shards=args.shards,
        )
    curated.write.mode("overwrite").parquet(args.output)
    if scrubbed is not None:
        scrubbed.unpersist()  # output materialized; release the cache
    out = spark.read.parquet(args.output)
    n_chunks = out.count()
    n_docs = out.select("doc_id").distinct().count()
    n_bins = out.select("bin_id").distinct().count()
    print(json.dumps({
        "input_docs": n_in, "kept_docs": n_docs,
        "kept_fraction": round(n_docs / n_in, 4) if n_in else None,
        "chunks": n_chunks, "bins": n_bins, "out": args.output,
        "tokens_scrubbed": tokens_scrubbed,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
