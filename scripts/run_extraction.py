#!/usr/bin/env python3
"""Cluster entrypoint for the extraction job.

    spark-submit --py-files pdf_parser_python_spark.zip \
        scripts/run_extraction.py \
        --input  <documents table dir (parquet)> \
        --output <output dir> \
        [--buckets 256] [--max-buckets N] [--streaming]

Batch mode runs the checkpoint-resumable bucket loop
(plans/lineage.ExtractionJob) — re-running the same command resumes
from the lineage table. --streaming instead launches the Structured
Streaming variant (exactly-once, availableNow backlog drain).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--max-buckets", type=int, default=None)
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--no-page", action="store_true",
                    help="input uses the bare input_hint schema (no page)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("spark-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    if args.streaming:
        from pdf_parser_python_spark.streaming.stream import start_extraction

        q = start_extraction(
            spark, args.input, args.output, available_now=True,
            with_page=not args.no_page,
        )
        q.awaitTermination()
        print(json.dumps({"mode": "streaming", "status": "drained"}))
        return

    from pdf_parser_python_spark.plans.lineage import ExtractionJob

    docs = spark.read.parquet(args.input)
    job = ExtractionJob(args.output, n_buckets=args.buckets)
    summary = job.run(spark, docs, max_buckets=args.max_buckets)
    metrics = [r for r in job.lineage_rows() if r["status"] == "done"]
    print(
        json.dumps(
            {
                "mode": "batch",
                **summary,
                "docs_parsed": sum(m["docs_parsed"] for m in metrics),
                "questions_emitted": sum(
                    m["questions_emitted"] for m in metrics
                ),
                "spans_emitted": sum(m["spans_emitted"] for m in metrics),
                "parse_failures": sum(m["parse_failures"] for m in metrics),
            }
        )
    )


if __name__ == "__main__":
    main()
