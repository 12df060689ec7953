"""All three segmentation engines must agree span-for-span."""

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.operators import finalize
from pdf_parser_python_spark.operators.flatten import flat_spans
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources.spans import generate_doc_spans


def _flat(spark, docs, engine):
    raw = pipeline.parse_raw(docs, engine=engine)
    rows = flat_spans(finalize.finalize_questions(raw)).collect()
    return sorted(
        (r.doc_id, r.seq, r.order, r.question_number, r.section, r.kind,
         r.text, r.media_ref)
        for r in rows
    )


def test_engines_agree(spark):
    corpus = [
        (f"eng-{i:03d}", generate_doc_spans(5000 + i, mean_questions=9))
        for i in range(15)
    ]
    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    packed = _flat(spark, docs, "packed")
    partition = _flat(spark, docs, "partition")
    grouped = _flat(spark, docs, "grouped")
    native = _flat(spark, docs, "native")
    assert packed == partition == grouped == native
    assert len(packed) > 200


def test_packed_handles_unsorted_spans(spark):
    spans = generate_doc_spans(7777, mean_questions=5)
    shuffled = list(reversed(spans))  # offsets encode the true order
    docs = spark.createDataFrame(
        [("shuf", shuffled), ("ord", spans)], schema=schema.DOCUMENT_SPANS_EXT
    )
    rows = pipeline.extract_flat_spans(docs).collect()
    a = sorted((r.seq, r.order, r.section, r.kind, r.text, r.media_ref)
               for r in rows if r.doc_id == "shuf")
    b = sorted((r.seq, r.order, r.section, r.kind, r.text, r.media_ref)
               for r in rows if r.doc_id == "ord")
    assert a == b and len(a) > 10
