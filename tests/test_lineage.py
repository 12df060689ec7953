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


def test_curation_job_interrupt_resume_and_parity(spark):
    """r6: CurationJob — same bucket-commit contract, gate output
    equals the batch gate after an interrupted run resumes."""
    from pyspark.sql import functions as F

    from pdf_parser_python_spark.operators.curation import curation_filter
    from pdf_parser_python_spark.operators.repetition import chunked_lines
    from pdf_parser_python_spark.plans.lineage import CurationJob

    docs = spark.createDataFrame(
        [(i,
          ("the quick brown fox is in that for with and of to "
           * (2 + i % 3)) if i % 4 else "zz")
         for i in range(60)],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as td:
        job = CurationJob(td, n_buckets=4)
        out1 = job.run(spark, docs, max_buckets=2)
        assert len(out1["processed"]) == 2 and len(out1["remaining"]) == 2
        out2 = job.run(spark, docs)  # resume
        assert not out2["remaining"]
        got = {tuple(r) for r in job.verdicts(spark).collect()}
        want = {tuple(r) for r in curation_filter(
            docs, lines=chunked_lines(F.col("text"), 10)).collect()}
        assert got == want
        lin = {r["partition_id"]: r for r in job.lineage_rows()}
        assert len(lin) == 4
        assert sum(r["docs_gated"] for r in lin.values()) == 60
        assert sum(r["docs_in"] for r in lin.values()) == 60
        kept = sum(r["docs_kept"] for r in lin.values())
        assert kept == sum(1 for t in got if t[-1])
        # rerun is a no-op
        assert job.run(spark, docs)["processed"] == []
