"""Normalize → hydrate round-trip: the reference's SQLite store +
hydration joins, as Spark tables (S6/S7/J2)."""

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.operators import store
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources.spans import generate_doc_spans


def _canon(rows):
    out = []
    for r in sorted(rows, key=lambda r: (r.doc_id, r.seq)):
        d = r.asDict(recursive=True)
        out.append(d)
    return out


def test_round_trip_identity(spark):
    corpus = [
        (f"db-{i:03d}", generate_doc_spans(6000 + i, mean_questions=7))
        for i in range(15)
    ]
    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    qs = pipeline.extract_questions(docs).select(
        "doc_id", "seq", "question_number", "question_type", "question_text",
        "question_images", "options", "answer_text", "answer_images",
        "explanation_text", "explanation_images", "page_start", "page_end",
        "anomalies", "anomaly_score",
    ).cache()

    tables = store.normalize(qs)
    assert tables["questions"].count() == qs.count()
    # child tables contain exactly the exploded content
    n_opts = qs.selectExpr("sum(size(options))").first()[0]
    assert tables["options"].count() == n_opts

    back = store.hydrate(tables)
    assert _canon(back.collect()) == _canon(qs.collect())


def test_json_sink_round_trip(spark, tmp_path):
    """S5: JSON sink/source (reference engine.py:206-223 wrote parse
    results as JSON files)."""
    corpus = [("js-1", generate_doc_spans(42, mean_questions=3))]
    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    flat = pipeline.extract_flat_spans(docs)
    out = str(tmp_path / "spans_json")
    flat.write.json(out)
    back = spark.read.json(out)
    assert back.count() == flat.count()
    a = sorted((r.seq, r.order, r.section, r.kind, r.text, r.media_ref)
               for r in flat.collect())
    b = sorted((r.seq, r.order, r.section, r.kind, r.text, r.media_ref)
               for r in back.collect())
    assert a == b


def test_bucketed_join_is_shuffle_free(spark):
    """write_bucketed on both join sides ⇒ the join plan has NO
    Exchange (bucket specs matched at plan time) and the result
    equals the plain shuffled join."""
    import tempfile

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("n_len"))
    with tempfile.TemporaryDirectory() as td:
        spark.sql("DROP TABLE IF EXISTS tb_docs")
        spark.sql("DROP TABLE IF EXISTS tb_stats")
        store.write_bucketed(
            docs, "tb_docs", "doc_id", 8,
            sort_col="doc_id", path=td + "/docs",
        )
        store.write_bucketed(
            stats, "tb_stats", "doc_id", 8,
            sort_col="doc_id", path=td + "/stats",
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("tb_docs").join(
                spark.table("tb_stats"), "doc_id"
            ).select("doc_id", "source", "n_len")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            got = {(r.doc_id, r.source, r.n_len) for r in j.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        expected = {
            (r.doc_id, r.source, r.n_len)
            for r in docs.join(stats, "doc_id")
            .select("doc_id", "source", "n_len")
            .collect()
        }
        assert got == expected
        spark.sql("DROP TABLE tb_docs")
        spark.sql("DROP TABLE tb_stats")
