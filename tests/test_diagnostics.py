"""Raw-rescan diagnostics (reference background_worker.py:417-435,
503-593): anchors visible in raw text but absent from parsed output."""

from pyspark.sql import functions as F

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.operators import diagnostics
from pdf_parser_python_spark.plans import pipeline


def _t(text, offset, page=1):
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset,
            "page": page}


def _doc(spark, spans, doc_id="d"):
    return spark.createDataFrame(
        [(doc_id, spans)], schema=schema.DOCUMENT_SPANS_EXT
    )


def test_solo_artifact_is_missing_with_page_and_reason(spark):
    """A page-end 'Question 5' artifact: the raw scan detects it, the
    FSM (correctly) ignores it → a missing-question diagnostic with the
    first-seen page and a diagnosis string."""
    docs = _doc(spark, [
        _t("Question: 1 What?", 0, page=1),
        _t("A. x", 1, page=1),
        _t("Answer: A", 2, page=1),
        _t("Question 5", 3, page=2),          # solo artifact, page 2
        _t("Question: 2 Next?", 4, page=2),
        _t("Answer: B", 5, page=2),
    ])
    parsed = pipeline.extract_questions(docs)
    missing = diagnostics.missing_questions(docs, parsed).collect()
    assert len(missing) == 1
    m = missing[0]
    assert m.question_number == 5 and m.page_detected == 2
    assert m.same_page_others == 1  # question 2 also raw-detected on page 2
    assert "state machine could not" in m.reason
    assert not m.reason.startswith("Sole question")

    summary = diagnostics.rescan_summary(docs, parsed).first()
    assert summary.raw_detected_count == 3
    assert summary.parsed_count == 2
    assert summary.missing_lost_count == 1
    # union {1,2,5} → gaps {3,4}
    assert summary.sequence_gap_count == 2
    assert summary.duplicate_count == 0


def test_sole_on_page_reason(spark):
    docs = _doc(spark, [
        _t("Question: 1 What?", 0, page=1),
        _t("Answer: A", 1, page=1),
        _t("Question 9", 2, page=7),          # alone on page 7
    ])
    parsed = pipeline.extract_questions(docs)
    m = diagnostics.missing_questions(docs, parsed).first()
    assert m.question_number == 9 and m.page_detected == 7
    assert m.reason.startswith("Sole question on page")


def test_midblock_anchor_and_first_page_kept(spark):
    """Anchors after \\n inside one raw block are detected; first-seen
    page wins for duplicates (reference keeps first page)."""
    docs = _doc(spark, [
        _t("preamble\nQuestion: 3 embedded?", 0, page=4),
        _t("Answer: C", 1, page=4),
        _t("Question 3", 2, page=9),  # later artifact, same number
    ])
    raw = {r.question_number: r.page_detected
           for r in diagnostics.raw_scan_questions(docs).collect()}
    assert raw == {3: 4}


def test_duplicates_counted_from_parsed_entities(spark):
    docs = _doc(spark, [
        _t("Question: 2 first copy", 0),
        _t("Answer: A", 1),
        _t("Question: 2 second copy", 2),
        _t("Answer: B", 3),
    ])
    parsed = pipeline.extract_questions(docs)
    s = diagnostics.rescan_summary(docs, parsed).first()
    assert s.parsed_count == 2          # entity count, dupes included
    assert s.raw_detected_count == 1
    assert s.duplicate_count == 1
    assert s.missing_lost_count == 0
