"""Checkpoint/resume with per-partition lineage (north-rule contract)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.plans.lineage import ExtractionJob
from pdf_parser_python_spark.sources.spans import generate_doc_spans


@pytest.fixture(scope="module")
def docs(spark):
    corpus = [
        (f"lin-{i:04d}", generate_doc_spans(3000 + i, mean_questions=6))
        for i in range(40)
    ]
    return spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT).cache()


def test_interrupt_and_resume(spark, docs):
    with tempfile.TemporaryDirectory() as td:
        job = ExtractionJob(td, n_buckets=8)

        # simulate a crash after 3 committed buckets
        first = job.run(spark, docs, max_buckets=3)
        assert len(first["processed"]) == 3
        assert len(first["remaining"]) == 5
        partial = job.questions(spark).count()
        assert partial > 0

        # resume: only pending buckets run; nothing reprocessed
        second = job.run(spark, docs)
        assert sorted(first["processed"] + second["processed"]) == list(range(8))
        assert second["remaining"] == []

        # lineage: 8 done rows with real metrics
        lin = {r["partition_id"]: r for r in job.lineage_rows()}
        assert len(lin) == 8
        assert all(r["status"] == "done" for r in lin.values())
        assert sum(r["docs_parsed"] for r in lin.values()) == 40
        assert all(r["parse_failures"] == 0 for r in lin.values())

        # results == single-shot pipeline, no dupes, no loss
        direct = pipeline.extract_questions(docs)
        got = job.questions(spark)
        assert got.count() == direct.count()
        assert (
            got.select("doc_id", "seq").distinct().count() == direct.count()
        )
        assert job.flat_spans(spark).count() == pipeline.extract_flat_spans(
            docs
        ).count()
        assert sum(r["questions_emitted"] for r in lin.values()) == direct.count()


def test_rerun_is_noop(spark, docs):
    with tempfile.TemporaryDirectory() as td:
        job = ExtractionJob(td, n_buckets=4)
        job.run(spark, docs)
        n1 = job.questions(spark).count()
        out = job.run(spark, docs)  # everything already committed
        assert out["processed"] == []
        assert job.questions(spark).count() == n1
        assert len(job.lineage_rows()) == 4
