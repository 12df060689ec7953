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


def test_dedup_job_two_phase_resume_and_parity(spark):
    """r7: DedupJob — signatures commit per bucket, the LSH candidate
    pass commits per band, interrupt either phase and resume; the
    committed pairs equal a non-resumable minhash_lsh_pairs run."""
    from pdf_parser_python_spark.operators.dedup import minhash_lsh_pairs
    from pdf_parser_python_spark.plans.lineage import DedupJob

    base = [
        (i, f"alpha beta gamma delta epsilon zeta {i} eta theta iota "
            f"kappa lam mu nu xi omicron pi rho")
        for i in range(40)
    ]
    # guaranteed near-dups: a mutated copy of every doc
    mut = [(i + 1000, t + " trailing edit") for i, t in base]
    docs = spark.createDataFrame(base + mut, "doc_id long, text string")
    kw = dict(k=32, bands=8, shingle_k=3, threshold=0.5)
    with tempfile.TemporaryDirectory() as td:
        job = DedupJob(td, n_buckets=4, **kw)

        # crash mid-phase-1: 2 of 4 signature buckets committed, no
        # band may run before every signature bucket is in
        out1 = job.run(spark, docs, max_buckets=2)
        assert len(out1["processed"]) == 2
        assert out1["bands_processed"] == []
        assert len(out1["bands_remaining"]) == 8

        # resume phase 1, crash mid-phase-2 after 3 bands
        out2 = job.run(spark, docs, max_bands=3)
        assert not out2["remaining"]
        assert len(out2["bands_processed"]) == 3
        assert len(out2["bands_remaining"]) == 5

        # resume phase 2 to completion
        out3 = job.run(spark, docs)
        assert not out3["bands_remaining"]

        got = {tuple(r) for r in job.pairs(spark).collect()}
        want = {tuple(r)
                for r in minhash_lsh_pairs(docs, **kw).collect()}
        assert got == want and len(got) >= 40

        # signatures survive the roundtrip; rerun is a no-op
        assert job.signatures(spark).count() == 80
        out4 = job.run(spark, docs)
        assert out4["processed"] == [] and out4["bands_processed"] == []

        # lineage frame is homogeneous across both phases
        lin = job.lineage(spark)
        assert lin.count() == 4 + 8
        assert set(lin.columns) >= {"partition_id", "phase", "status",
                                    "rows_emitted", "error"}
