"""Failure-path semantics of the lineage loop: a bucket that throws is
recorded status=failed, never poisons prior commits, and is retried on
the next run."""

import tempfile

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.plans.lineage import ExtractionJob
from pdf_parser_python_spark.sources.spans import generate_doc_spans


def test_failed_bucket_recorded_and_retried(spark):
    corpus = [
        (f"fl-{i:03d}", generate_doc_spans(8000 + i, mean_questions=4))
        for i in range(20)
    ]
    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)

    with tempfile.TemporaryDirectory() as td:
        job = ExtractionJob(td, n_buckets=4)
        real = job._write_bucket
        blown = []

        def flaky(bucket, bdocs, *meta):
            if bucket == 2 and not blown:
                blown.append(bucket)
                raise RuntimeError("simulated executor loss")
            return real(bucket, bdocs, *meta)

        job._write_bucket = flaky
        first = job.run(spark, docs)
        assert sorted(first["processed"]) == [0, 1, 3]
        statuses = {r["partition_id"]: r["status"] for r in job.lineage_rows()}
        assert statuses[2] == "failed"
        # look the failed row up by partition_id, not journal index:
        # r8's pooled commits append rows in completion order
        assert any(
            r["partition_id"] == 2
            and "simulated executor loss" in r.get("error", "")
            for r in job.lineage_rows()
        )

        # retry run: only the failed bucket reprocesses
        second = job.run(spark, docs)
        assert second["processed"] == [2]
        done = {r["partition_id"] for r in job.lineage_rows()
                if r["status"] == "done"}
        assert done == {0, 1, 2, 3}
        # final output complete and unique
        out = job.questions(spark)
        assert out.select("doc_id").distinct().count() == 20
