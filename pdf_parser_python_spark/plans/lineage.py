"""Checkpoint-resumable extraction with per-partition lineage + metrics.

Reference semantics being re-expressed (SURVEY.md §2.8):

- micro-batch unit: the reference commits per PDF page
  (/root/reference/parser/background_worker.py:189-232); here the unit
  is a doc_id-hash bucket of the input table — state never spans
  buckets because every document lives in exactly one;
- checkpoint: the reference advances ``exams.current_page``
  (background_worker.py:226); here a lineage row
  ``(partition_id, status, metrics...)`` is appended after each bucket
  commits;
- resume/replay: the reference re-runs pages 1..N-1 through the FSM
  (background_worker.py:179-186); here resume is a pure anti-join of
  bucket ids against the lineage table — no replay, because grouping
  by doc_id gives the FSM its whole input;
- idempotent writes: the reference deletes page-range rows before
  re-insert (background_worker.py:343-357, database.py:289-322); here
  each bucket's output directory is overwritten atomically before its
  lineage row lands (write data → commit lineage), so a crash between
  the two re-runs the bucket harmlessly.

Storage is a parquet directory layout with Iceberg-shaped semantics
(no Iceberg runtime jar ships in this sandbox); the lineage contract
is identical — swap `_write_bucket` for `overwritePartitions` on a
real catalog.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import finalize as _finalize
from ..operators import flatten as _flatten
from . import pipeline


class ExtractionJob:
    """Driver-side loop: process pending buckets, one commit each."""

    def __init__(self, out_dir: str, n_buckets: int = 16) -> None:
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.questions_dir = os.path.join(out_dir, "questions")
        self.spans_dir = os.path.join(out_dir, "flat_spans")
        self.raw_dir = os.path.join(out_dir, "raw_questions")
        self.lineage_path = os.path.join(out_dir, "lineage.jsonl")

    # ── lineage bookkeeping ──────────────────────────────────────────

    def lineage_rows(self) -> list[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    #: schema of the empty lineage frame (per-job-kind metric columns)
    EMPTY_LINEAGE_SCHEMA = (
        "partition_id int, status string, docs_parsed long, "
        "spans_emitted long, questions_emitted long, "
        "parse_failures long, wall_sec double"
    )

    def lineage(self, spark: SparkSession) -> DataFrame:
        rows = self.lineage_rows()
        if not rows:
            return spark.createDataFrame([], self.EMPTY_LINEAGE_SCHEMA)
        return spark.createDataFrame(rows)

    def done_buckets(self) -> set[int]:
        return {
            r["partition_id"]
            for r in self.lineage_rows()
            if r["status"] == "done"
        }

    def pending_buckets(self) -> list[int]:
        done = self.done_buckets()
        return [b for b in range(self.n_buckets) if b not in done]

    def _append_lineage(self, row: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        with open(self.lineage_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")

    # ── bucket processing ────────────────────────────────────────────

    def _bucketed(self, documents: DataFrame) -> DataFrame:
        return documents.withColumn(
            "bucket",
            F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int"),
        )

    def _stage_input(self, documents: DataFrame) -> str:
        """One-time ingest normalization: write the input partitioned by
        bucket so every per-bucket pass is partition-pruned instead of a
        full-corpus scan (the parquet stand-in for an Iceberg table
        partitioned on bucket(doc_id)). Per-bucket input metrics
        (docs, spans) are computed HERE, in one aggregation over the
        staged table, so bucket commits never re-scan the input for
        bookkeeping. Idempotent via a _STAGED marker.
        """
        staged = os.path.join(self.out_dir, "input_bucketed")
        marker = os.path.join(staged, "_STAGED")
        if not os.path.exists(marker):
            self._bucketed(documents).write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(staged)
            m = (
                documents.sparkSession.read.parquet(staged)
                .groupBy("bucket")
                .agg(
                    F.count("*").alias("d"),
                    self._input_metric_expr().alias("s"),
                )
                .collect()
            )
            metrics = {int(r["bucket"]): [int(r["d"]), int(r["s"] or 0)]
                       for r in m}
            with open(os.path.join(staged, "_input_metrics.json"), "w") as fh:
                json.dump(metrics, fh)
            with open(marker, "w") as fh:
                fh.write("ok\n")
        return staged

    def _input_metric_expr(self):
        """Second per-bucket input metric (first is doc count) — the
        extraction job tracks input spans; subclasses override."""
        return F.sum(F.size("spans"))

    def _input_metrics(self, staged: str, bucket: int) -> tuple[int, int]:
        with open(os.path.join(staged, "_input_metrics.json")) as fh:
            metrics = json.load(fh)
        return tuple(metrics.get(str(bucket), [0, 0]))

    def _write_bucket(
        self, bucket: int, docs: DataFrame, n_docs: int, n_spans_in: int
    ) -> dict:
        """One bucket commit — the parse executes exactly ONCE.

        Round 1 ran the parse twice (questions write + failure count)
        and scanned the input a third time for metrics; at scale that
        doubled extraction cost per bucket. Now the raw kernel output
        (incl. parse_failed sentinel rows) is materialized first, and
        questions/flat-spans/failure counts all derive from written
        parquet; input metrics come from staging time.
        """
        t0 = time.perf_counter()
        spark = docs.sparkSession
        qdir = os.path.join(self.questions_dir, f"bucket={bucket}")
        sdir = os.path.join(self.spans_dir, f"bucket={bucket}")
        rdir = os.path.join(self.raw_dir, f"bucket={bucket}")
        # delete-before-insert (reference background_worker.py:343-357)
        for d in (qdir, sdir, rdir):
            shutil.rmtree(d, ignore_errors=True)

        # metric counts ride ON the write actions (Observation API) —
        # r5: the three separate count() jobs were measured as a large
        # share of the per-bucket fixed cost (BENCH.md lineage phase);
        # at 4096 buckets that is 3×4096 driver round-trips for numbers
        # the write jobs already see
        from pyspark.sql import Observation

        ob_raw = Observation()
        pipeline.parse_raw(docs).observe(
            ob_raw,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("parse_failed").cast("long")).alias("nf"),
        ).write.mode("overwrite").parquet(rdir)
        n_fail = int(ob_raw.get["nf"] or 0)
        raw = spark.read.parquet(rdir)

        ob_q = Observation()
        _finalize.finalize_questions(raw).observe(
            ob_q, F.count(F.lit(1)).alias("n")
        ).write.mode("overwrite").parquet(qdir)
        n_q = int(ob_q.get["n"])
        written = spark.read.parquet(qdir)

        ob_s = Observation()
        _flatten.flat_spans(written).observe(
            ob_s, F.count(F.lit(1)).alias("n")
        ).write.mode("overwrite").parquet(sdir)
        n_spans_out = int(ob_s.get["n"])
        return {
            "partition_id": bucket,
            "status": "done",
            "docs_parsed": n_docs,
            "spans_emitted": int(n_spans_out),
            "questions_emitted": int(n_q),
            "parse_failures": int(n_fail),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "input_spans": int(n_spans_in),
        }

    def _empty_row(self, bucket: int) -> dict:
        return {
            "partition_id": bucket, "status": "done", "docs_parsed": 0,
            "spans_emitted": 0, "questions_emitted": 0,
            "parse_failures": 0, "wall_sec": 0.0, "input_spans": 0,
        }

    def _failed_row(self, bucket: int, exc: Exception) -> dict:
        return {
            "partition_id": bucket, "status": "failed", "docs_parsed": 0,
            "spans_emitted": 0, "questions_emitted": 0,
            "parse_failures": 0, "wall_sec": 0.0, "error": str(exc)[:500],
        }

    def run(
        self,
        spark: SparkSession,
        documents: DataFrame,
        max_buckets: int | None = None,
    ) -> dict:
        """Process pending buckets (resume == call run() again).

        ``max_buckets`` limits how many buckets this invocation commits
        — the test hook for simulated interruption.
        """
        pending = self.pending_buckets()
        if max_buckets is not None:
            pending = pending[:max_buckets]
        spark = documents.sparkSession
        staged = self._stage_input(documents)
        processed = []
        for b in pending:
            bdir = os.path.join(staged, f"bucket={b}")
            if not os.path.exists(bdir):  # hash range empty at this size
                self._append_lineage(self._empty_row(b))
                processed.append(b)
                continue
            docs_b = spark.read.parquet(bdir)
            n_docs, n_spans_in = self._input_metrics(staged, b)
            try:
                row = self._write_bucket(b, docs_b, n_docs, n_spans_in)
            except Exception as exc:  # never lose prior commits
                self._append_lineage(self._failed_row(b, exc))
                continue
            self._append_lineage(row)
            processed.append(b)
        return {
            "processed": processed,
            "remaining": self.pending_buckets(),
            "total_buckets": self.n_buckets,
        }

    # ── results ──────────────────────────────────────────────────────

    def _read_done(self, spark: SparkSession, base: str) -> DataFrame:
        paths = [
            p
            for b in sorted(self.done_buckets())
            if os.path.exists(p := os.path.join(base, f"bucket={b}"))
        ]
        return spark.read.option("basePath", base).parquet(*paths)

    def questions(self, spark: SparkSession) -> DataFrame:
        return self._read_done(spark, self.questions_dir)

    def flat_spans(self, spark: SparkSession) -> DataFrame:
        return self._read_done(spark, self.spans_dir)


class CurationJob(ExtractionJob):
    """Checkpoint-resumable CURATION: the composite keep/drop gate
    (operators/curation.py) under the exact bucket-commit contract of
    :class:`ExtractionJob` — doc_id-hash buckets, delete-before-insert,
    lineage row appended after data, resume = run() again and only
    pending buckets execute. Per-bucket metrics ride on the write via
    the Observation API (docs gated, docs kept); input metrics (docs,
    tokens) come from staging time. Extends the north-rule resumability
    story from extraction to the training-data lane."""

    EMPTY_LINEAGE_SCHEMA = (
        "partition_id int, status string, docs_in long, docs_gated long, "
        "docs_kept long, wall_sec double"
    )

    def __init__(
        self,
        out_dir: str,
        n_buckets: int = 16,
        line_width: int = 10,
        **gate_kw,
    ) -> None:
        super().__init__(out_dir, n_buckets)
        self.verdicts_dir = os.path.join(out_dir, "verdicts")
        self.line_width = line_width
        self.gate_kw = gate_kw

    def _input_metric_expr(self):
        from ..operators.textstats import token_count

        return F.sum(
            token_count(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        )

    def _empty_row(self, bucket: int) -> dict:
        return {
            "partition_id": bucket, "status": "done", "docs_in": 0,
            "docs_gated": 0, "docs_kept": 0, "wall_sec": 0.0,
            "input_tokens": 0,
        }

    def _failed_row(self, bucket: int, exc: Exception) -> dict:
        return {
            "partition_id": bucket, "status": "failed", "docs_in": 0,
            "docs_gated": 0, "docs_kept": 0, "wall_sec": 0.0,
            "error": str(exc)[:500],
        }

    def _write_bucket(
        self, bucket: int, docs: DataFrame, n_docs: int, n_tokens_in: int
    ) -> dict:
        from pyspark.sql import Observation

        from ..operators.curation import curation_filter
        from ..operators.repetition import chunked_lines

        t0 = time.perf_counter()
        vdir = os.path.join(self.verdicts_dir, f"bucket={bucket}")
        shutil.rmtree(vdir, ignore_errors=True)
        ob = Observation()
        gate = curation_filter(
            docs.drop("bucket"),
            lines=chunked_lines(F.col("text"), self.line_width),
            **self.gate_kw,
        )
        gate.observe(
            ob,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("k"),
        ).write.mode("overwrite").parquet(vdir)
        return {
            "partition_id": bucket,
            "status": "done",
            "docs_in": n_docs,
            "docs_gated": int(ob.get["n"]),
            "docs_kept": int(ob.get["k"] or 0),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "input_tokens": int(n_tokens_in),
        }

    def verdicts(self, spark: SparkSession) -> DataFrame:
        return self._read_done(spark, self.verdicts_dir).drop("bucket")
