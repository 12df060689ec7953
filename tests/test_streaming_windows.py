"""Watermarked event-time aggregation + the stateful span assembler."""

import json
import os
import tempfile
import time

from pyspark.sql import functions as F

from pdf_parser_python_spark.streaming import windows as W


def test_windowed_counts_with_watermark(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        ev.write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        agg = W.windowed_event_counts(stream, "1 minute", "2 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("winagg")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(td, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("select * from winagg").collect()
        }
        assert len(got) > 10

        # emitted windows must equal the batch computation exactly
        batch = (
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .collect()
        )
        expected = {(r.w.start, r.event_type): (r.n, r.v) for r in batch}
        for k, v in got.items():
            assert expected[k] == v
        # append-mode holds back only windows not yet past the watermark
        assert len(got) <= len(expected)


def test_stateful_doc_assembler(spark):
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        rows = []
        for d in range(3):
            for i in range(5 + d):
                rows.append((f"doc-{d}", "text" if i % 2 == 0 else "image",
                             f"line {i}" if i % 2 == 0 else "",
                             "" if i % 2 == 0 else f"img/{d}/{i}", i))
        df = spark.createDataFrame(
            rows, "doc_id string, kind string, text string, "
                  "media_ref string, offset int"
        )
        df.coalesce(1).write.parquet(os.path.join(src, "part1"))

        stream = spark.readStream.schema(df.schema).parquet(src + "/*")
        out = W.stateful_doc_assembler(stream, timeout_ms=800)
        q = (
            out.writeStream.format("memory")
            .queryName("assembled")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(td, "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql("select * from assembled").collect()
            if len(got) == 3:
                break
            time.sleep(0.5)
        q.stop()
        assert len(got) == 3
        by_doc = {r.doc_id: r for r in got}
        for d in range(3):
            r = by_doc[f"doc-{d}"]
            assert r.n_spans == 5 + d
            spans = json.loads(r.spans_json)
            assert [s["offset"] for s in spans] == list(range(5 + d))


def test_assembler_feeds_vectorized_kernel(spark):
    """Finished documents from the stateful assembler flow through the
    SAME vectorized extraction kernel as batch, inside one streaming
    query (stateful stage → stateless mapInArrow)."""
    from pdf_parser_python_spark import schema
    from pdf_parser_python_spark.plans import pipeline

    lines = ["Question: 1", "What is streaming?", "A. a river",
             "B. a query", "Answer: B", "Question: 2",
             "Why vectorize?", "A. speed", "B. style", "Answer: A"]
    rows = [("sdoc-0", "text", ln, "", i) for i, ln in enumerate(lines)]

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        df = spark.createDataFrame(
            rows, "doc_id string, kind string, text string, "
                  "media_ref string, offset int"
        )
        df.coalesce(1).write.parquet(os.path.join(src, "part1"))

        stream = spark.readStream.schema(df.schema).parquet(src + "/*")
        assembled = W.stateful_doc_assembler(stream, timeout_ms=800)
        questions = pipeline.extract_questions(
            W.assembled_documents(assembled)
        )
        q = (
            questions.writeStream.format("memory")
            .queryName("stream_questions")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(td, "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            got = spark.sql("select * from stream_questions").collect()
            if len(got) == 2:
                break
            time.sleep(0.5)
        q.stop()

        # row-equal to the batch vectorized kernel over the same doc
        batch_doc = spark.createDataFrame(
            [("sdoc-0",
              [{"kind": "text", "text": ln, "media_ref": "", "offset": i}
               for i, ln in enumerate(lines)])],
            schema=schema.DOCUMENT_SPANS,
        )
        expected = pipeline.extract_questions(batch_doc).collect()
        key = lambda r: (r["seq"], r["question_number"],
                         r["question_text"], r["answer_text"])
        assert sorted(map(key, got)) == sorted(map(key, expected))
