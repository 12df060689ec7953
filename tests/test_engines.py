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

    # the vectorized arrow kernel (default extract_flat_spans path) and
    # the fused pandas kernel must emit identical flat spans
    vec = sorted(
        (r.doc_id, r.seq, r.order, r.question_number, r.section, r.kind,
         r.text, r.media_ref)
        for r in pipeline.extract_flat_spans(docs).collect()
    )
    pand = sorted(
        (r.doc_id, r.seq, r.order, r.question_number, r.section, r.kind,
         r.text, r.media_ref)
        for r in pipeline.extract_flat_spans(
            docs, engine="packed-pandas").collect()
    )
    assert vec == pand

    # question scalars (vectorized) vs the full finalize pipeline
    scal = sorted(
        tuple(r)
        for r in pipeline.extract_question_scalars(docs).collect()
    )
    full = sorted(
        tuple(r)
        for r in pipeline.extract_questions(docs, engine="grouped").select(
            "doc_id", "seq", "question_number", "question_type",
            "question_text", "answer_text", "anomaly_score",
        ).collect()
    )
    assert scal == full

    # full-entity emitters: vectorized arrow vs fused pandas, every
    # nested field (options incl J5 marking, images, anomalies, pages)
    def entities(engine):
        rows = pipeline.extract_questions(docs, engine=engine).collect()
        return sorted(
            (
                r.doc_id, r.seq, r.question_number, r.question_type,
                r.question_text,
                tuple(r.question_images),
                tuple(
                    (o["key"], o["text"], o["is_correct"],
                     tuple(o["images"]))
                    for o in r.options
                ),
                r.answer_text, tuple(r.answer_images),
                r.explanation_text, tuple(r.explanation_images),
                r.page_start, r.page_end,
                tuple(
                    (a["type"], a["severity"], a["message"],
                     tuple(sorted((a["context"] or {}).items())))
                    for a in r.anomalies
                ),
                r.anomaly_score, r.has_question_text, r.has_answer,
                r.has_explanation, r.image_count,
            )
            for r in rows
        )

    assert entities("packed") == entities("packed-pandas")


def test_py_ws_chars_equals_python_whitespace_everywhere():
    """anchors.PY_WS_CHARS (the RE2 \\s rewrite + arrow trim set) must
    equal Python's re-\\s / str.strip() set char-for-char over ALL of
    Unicode — the invariant the vectorized kernel's dialect safety
    rests on."""
    import re

    from pdf_parser_python_spark.functions.anchors import PY_WS_CHARS

    ws = set(PY_WS_CHARS)
    for c in range(0x110000):
        ch = chr(c)
        assert (ch in ws) == bool(re.match(r"\s", ch)), hex(c)
        assert (ch in ws) == ch.isspace(), hex(c)


def test_nonascii_stays_on_vectorized_path(spark):
    """NBSP/Zs whitespace and plain accented content must NOT trigger
    the python fallback; genuinely divergent chars must."""
    import pyarrow as pa

    from pdf_parser_python_spark.operators import vkernel

    def batch(text):
        return pa.RecordBatch.from_arrays(
            [
                pa.array(["d"]),
                pa.array([["text"]], pa.list_(pa.string())),
                pa.array([[text]], pa.list_(pa.string())),
                pa.array([[""]], pa.list_(pa.string())),
                pa.array([[1]], pa.list_(pa.int32())),
            ],
            names=["doc_id", "kinds", "texts", "refs", "pages"],
        )

    def falls_back(text):
        _, _, fb = vkernel._explode_batch(batch(text))
        return bool(fb)

    assert not falls_back("\xa0Question:\xa05\xa0\ncafé body")
    assert not falls_back("body with Zs　spaces")
    assert falls_back("Question: ٣")          # non-ASCII digit
    assert falls_back("questİon: 5")          # İ folds to i only in re
    assert falls_back("Thank you for yourété")  # \b divergence

    # NBSP-wrapped anchor parses identically through the arrow path
    docs = spark.createDataFrame(
        [("nb", [
            {"kind": "text", "text": "\xa0Question:\xa07\xa0\nbody é",
             "media_ref": None, "offset": 0, "page": 1},
            {"kind": "text", "text": "Answer:\xa0B", "media_ref": None,
             "offset": 1, "page": 1},
        ])],
        schema=schema.DOCUMENT_SPANS_EXT,
    )
    rows = sorted(
        (r.question_number, r.section, r.text)
        for r in pipeline.extract_flat_spans(docs).collect()
    )
    assert rows == [(7, "answer", "B"), (7, "question", "body é")], rows


def test_zero_padded_and_overflow_qnum_clamp(spark):
    """ADVICE r2 (medium): clamp question numbers on the numeric VALUE
    everywhere — '0…05' is 5 (the reference's plain int(),
    state_machine.py:217), not a >18-char digit string; only values
    beyond int64 clamp to QNUM_CAP, identically in every engine."""
    from pdf_parser_python_spark.functions import anchors as A

    spans = []
    for off, line in enumerate([
        "Question: 0005",
        "padded body",
        "Question: 0000000000000000000000042",  # 25 digits, value 42
        "value fits int64",
        "Question: 99999999999999999999",  # 20 digits > int64 → CAP
        "overflow body",
    ]):
        spans.append({"kind": "text", "text": line, "media_ref": "",
                      "offset": off, "page": 1})
    docs = spark.createDataFrame(
        [("zp", spans)], schema=schema.DOCUMENT_SPANS_EXT
    )
    per_engine = {}
    for engine in ("packed", "partition", "grouped", "native"):
        rows = pipeline.parse_raw(docs, engine=engine).collect()
        per_engine[engine] = sorted(
            (r.seq, r.question_number) for r in rows
        )
    vals = list(per_engine.values())
    assert all(v == vals[0] for v in vals), per_engine
    assert [n for _, n in vals[0]] == [5, 42, A.QNUM_CAP]

    # the int64-representable ones must match the live reference exactly
    from .oracle import run_reference

    ref = run_reference(spans[:4])
    assert [q["question_number"] for q in ref] == [5, 42]


def test_packed_handles_mixed_null_pages(spark):
    """A null page ELEMENT inside an otherwise non-null page array
    arrives in the Arrow batch as NaN (float), not None — the packed
    kernel must coerce it to page 1, not crash on int(NaN)."""
    spans = [
        {"kind": "text", "text": None, "media_ref": None, "offset": 0,
         "page": None},
        {"kind": "text", "text": "Question: 3 q", "media_ref": None,
         "offset": 1, "page": 2},
    ]
    d = spark.createDataFrame([("z", spans)],
                              schema=schema.DOCUMENT_SPANS_EXT)
    rows = pipeline.extract_questions(d).collect()
    assert [r.question_number for r in rows] == [3]


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


def test_doc_text_equals_groupby_reassembly(spark):
    """r7: the in-kernel exam reassembly (pipeline.extract_doc_text)
    must be row-equal to the groupBy(collect_list) formulation it
    replaces — including docs routed to the python fallback (risky
    non-ASCII) and docs whose flat output has zero text spans."""
    from pyspark.sql import functions as F

    corpus = [
        (f"dtx-{i:03d}", generate_doc_spans(7000 + i, mean_questions=7))
        for i in range(12)
    ]
    # a dialect-divergent doc (Arabic-Indic digits) → python fallback
    corpus.append(
        (
            "dtx-fb",
            [
                ("text", "Question 1. ما هو ٣ زائد ٤؟", "", 0, 1),
                ("text", "A. سبعة", "", 1, 1),
                ("text", "B. ثمانية", "", 2, 1),
                ("text", "Answer: A", "", 3, 1),
            ],
        )
    )
    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    kernel = sorted(
        tuple(r) for r in pipeline.extract_doc_text(docs).collect()
    )
    flat = pipeline.extract_flat_spans(docs).where(F.col("kind") == "text")
    grouped = sorted(
        tuple(r)
        for r in flat.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq", "order", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text"),
            F.count("*").cast("bigint").alias("n_text_spans"),
        )
        .collect()
    )
    assert kernel == grouped
    assert any(r[0] == "dtx-fb" for r in kernel)
    assert len(kernel) == len(corpus)

    # forced-giant dispatch: the union branch must agree too
    giant = sorted(
        tuple(r)
        for r in pipeline.extract_doc_text(docs, giant_doc_spans=10)
        .collect()
    )
    assert giant == grouped
