"""Incremental extraction via Structured Streaming: exactly-once file
processing, restart picks up only new input."""

import os
import tempfile

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources.spans import generate_doc_spans
from pdf_parser_python_spark.streaming import stream as streaming


def _write_chunk(spark, input_dir, start, n):
    corpus = [
        (f"st-{i:04d}", generate_doc_spans(4000 + i, mean_questions=5))
        for i in range(start, start + n)
    ]
    df = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    df.coalesce(1).write.mode("append").parquet(input_dir)
    return df


def test_streaming_incremental(spark):
    with tempfile.TemporaryDirectory() as td:
        input_dir = os.path.join(td, "in")
        output_dir = os.path.join(td, "out")

        d1 = _write_chunk(spark, input_dir, 0, 12)
        q = streaming.start_extraction(spark, input_dir, output_dir)
        q.awaitTermination(120)
        out1 = spark.read.parquet(os.path.join(output_dir, "questions"))
        expected1 = pipeline.extract_questions(d1).count()
        assert out1.count() == expected1

        # add a second chunk; restart processes ONLY the new files
        d2 = _write_chunk(spark, input_dir, 12, 8)
        q2 = streaming.start_extraction(spark, input_dir, output_dir)
        q2.awaitTermination(120)
        out2 = spark.read.parquet(os.path.join(output_dir, "questions"))
        expected2 = pipeline.extract_questions(d2).count()
        assert out2.count() == expected1 + expected2

        # no duplicates (exactly-once)
        assert out2.select("doc_id", "seq").distinct().count() == out2.count()

        # restart with no new input → no new rows
        q3 = streaming.start_extraction(spark, input_dir, output_dir)
        q3.awaitTermination(120)
        out3 = spark.read.parquet(os.path.join(output_dir, "questions"))
        assert out3.count() == expected1 + expected2


def test_streaming_curation_gate_incremental(spark):
    """r6: the curation gate streams (stateless map) with exactly-once
    file processing, and verdicts equal the batch gate's."""
    from pyspark.sql import functions as F

    from pdf_parser_python_spark.operators.curation import curation_filter
    from pdf_parser_python_spark.operators.repetition import chunked_lines

    def mk(lo, n):
        return spark.createDataFrame(
            [(i,
              ("the quick brown fox is in that for with and of to "
               * (2 + i % 3)) if i % 4 else "xx")
             for i in range(lo, lo + n)],
            "doc_id long, text string",
        )

    with tempfile.TemporaryDirectory() as td:
        input_dir = os.path.join(td, "in")
        output_dir = os.path.join(td, "out")
        d1 = mk(0, 10)
        d1.write.mode("append").parquet(input_dir)
        streaming.start_curation(spark, input_dir, output_dir
                                 ).awaitTermination(120)
        out1 = spark.read.parquet(os.path.join(output_dir, "verdicts"))
        assert out1.count() == 10

        d2 = mk(10, 6)
        d2.write.mode("append").parquet(input_dir)
        streaming.start_curation(spark, input_dir, output_dir
                                 ).awaitTermination(120)
        out2 = spark.read.parquet(os.path.join(output_dir, "verdicts"))
        assert out2.count() == 16
        assert out2.select("doc_id").distinct().count() == 16

        # streaming verdicts == batch verdicts, row for row
        batch = curation_filter(
            d1.unionByName(d2),
            lines=chunked_lines(F.col("text"), 10),
        )
        got = {tuple(r) for r in out2.collect()}
        want = {tuple(r) for r in batch.collect()}
        assert got == want
