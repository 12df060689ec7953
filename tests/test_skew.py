"""Giant-document skew: one doc with ~100× the median span count must
parse correctly through every engine and must not dominate wall-clock
pathologically (the packed kernel streams it inside one Arrow row; the
partition kernel streams it across Arrow batches)."""

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources.spans import generate_doc_spans

from .oracle import flatten_doc, run_reference


def test_giant_doc_correct_on_all_engines(spark):
    # giant_every=3 → docs 2, 5 are 100× tails
    corpus = [
        (f"sk-{i}", generate_doc_spans(9000 + i, mean_questions=6,
                                       giant_every=3))
        for i in range(6)
    ]
    sizes = {d: len(s) for d, s in corpus}
    assert max(sizes.values()) > 20 * min(sizes.values())  # real skew

    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    expected = {
        d: flatten_doc(run_reference(s)) for d, s in corpus
    }
    for engine in ("packed", "partition"):
        from pdf_parser_python_spark.operators import finalize
        from pdf_parser_python_spark.operators.flatten import flat_spans

        rows = flat_spans(
            finalize.finalize_questions(pipeline.parse_raw(docs, engine=engine))
        ).collect()
        by_doc: dict[str, list] = {d: [] for d, _ in corpus}
        for r in rows:
            by_doc[r.doc_id].append(r)
        for d, exp in expected.items():
            got = [
                (r.question_number, r.section, r.kind, r.text, r.media_ref,
                 r.order)
                for r in sorted(by_doc[d], key=lambda r: (r.seq, r.order))
            ]
            assert got == exp, (engine, d)


def test_giant_doc_cross_batch_state(spark):
    """Force tiny Arrow batches so the giant doc spans dozens of
    batches in the partition kernel — state carry must hold."""
    spans = generate_doc_spans(9002, mean_questions=6, giant_every=1)
    assert len(spans) > 2000
    docs = spark.createDataFrame(
        [("giant", spans)], schema=schema.DOCUMENT_SPANS_EXT
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "97")
        got = (
            pipeline.extract_flat_spans(docs.repartition(1), engine="partition")
            .count()
        )
    finally:
        if old:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    expected = len(flatten_doc(run_reference(spans)))
    assert got == expected


def test_asof_hot_key_chunked_carry_equals_single_window(spark):
    """r8 (VERDICT r7 watch-item): a pathological hot key serializes
    the as-of carry onto one window task; ``chunk_micros`` splits the
    timeline and re-seeds chunk boundaries from a per-chunk state
    table. Row-identical to the single-window plan (tie-free
    timestamps), including left rows in chunks with no right rows and
    probes before any right row; the chunked plan must partition on
    (key, chunk) so the hot key spreads over many tasks."""
    from pyspark.sql import functions as F

    from pdf_parser_python_spark.operators.temporal import asof_join

    n = 20_000
    base = spark.range(n).select(
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_micros(
            F.col("id") * 1_000_000 + 1_600_000_000_000_000
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )
    lefts = base.where(F.col("event_id") % 5 == 0)
    # rights only in the first half: second-half chunks carry state
    # across MANY empty chunks
    rights = base.where(
        (F.col("event_id") % 5 != 0) & (F.col("event_id") < n // 2)
    ).select("user_id", "ts", "event_id")

    hour_us = 3600 * 1_000_000
    for how in ("inner", "left"):
        want = {
            tuple(r)
            for r in asof_join(lefts, rights, how=how).collect()
        }
        got_df = asof_join(
            lefts, rights, how=how, chunk_micros=hour_us
        )
        got = {tuple(r) for r in got_df.collect()}
        assert got == want and len(want) > 1000, how

    plan = asof_join(
        lefts, rights, chunk_micros=hour_us
    )._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in plan
    seg = plan.split("hashpartitioning(user_id", 1)[1][:60]
    assert "_ck" in seg, seg  # the carry window spreads over chunks
