"""Intra-document parallel segmentation (native engine, chunk_size):
the doc-sequential segment-numbering prefix sum becomes a two-phase
chunked scan, so one giant document parses across many tasks with
span-identical output."""

from pyspark.sql import functions as F

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.operators import finalize
from pdf_parser_python_spark.operators.flatten import flat_spans
from pdf_parser_python_spark.operators.native import parse_native
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources.spans import generate_doc_spans


def _flat(spark, docs, **kw):
    raw = pipeline.parse_raw(docs, **kw)
    rows = flat_spans(finalize.finalize_questions(raw)).collect()
    return sorted(
        (r.doc_id, r.seq, r.order, r.question_number, r.section, r.kind,
         r.text, r.media_ref)
        for r in rows
    )


def test_chunked_native_equals_packed_on_faulted_corpus(spark):
    """chunk_size=7 slices every fault-injected document mid-question
    (boundary carry exercised hard); output must be span-identical."""
    corpus = [
        (f"pseg-{i}", generate_doc_spans(6200 + i, mean_questions=8))
        for i in range(10)
    ]
    docs = spark.createDataFrame(corpus, schema=schema.DOCUMENT_SPANS_EXT)
    assert _flat(spark, docs, engine="packed") == _flat(
        spark, docs, engine="native", chunk_size=7
    )


def _giant_lines(spark, n_questions: int, parts: int = 16):
    """One document, n_questions × 5 clean line rows, built natively."""
    per_q = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.lit(s).alias("tpl"),
            )
            for k, s in enumerate(
                ["Question: {n}", "body {n}", "A. alpha {n}", "B. beta {n}",
                 "Answer: A"]
            )
        ]
    )
    base = spark.range(0, n_questions, numPartitions=parts)
    rows = base.select(
        (F.col("id") + 1).alias("n"), F.explode(per_q).alias("p")
    )
    txt = F.replace(
        F.col("p.tpl"), F.lit("{n}"), F.col("n").cast("string")
    )
    return rows.select(
        F.lit("giant").alias("doc_id"),
        F.lit("text").alias("kind"),
        txt.alias("text"),
        F.lit("").alias("media_ref"),
        ((F.col("n") - 1) * 5 + F.col("p.k")).cast("int").alias("offset"),
        F.lit(0).alias("line_no"),
        F.lit(1).alias("page"),
    )


def test_giant_single_doc_parses_in_parallel(spark):
    n_q = 20_000  # 100k lines, one document
    lines = _giant_lines(spark, n_q)
    out = parse_native(lines, chunk_size=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scan stages key on (doc_id, _chunk)/(doc_id, _seg) — never a
    # whole-document window, so one doc spreads over many tasks
    import re as _re

    parts = _re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, plan[:500]
    assert any("_chunk" in p for p in parts)
    assert any("_seg" in p for p in parts)
    # runtime proof of intra-doc parallelism: the single document's
    # questions are assembled across >1 partition (doc-keyed grouping
    # would collapse everything onto one). AQE's size-based coalescing
    # is disabled for the probe — at test scale it folds the small
    # shuffle into one partition, which at 100 TB it would not.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        n_parts = (
            out.select(F.spark_partition_id().alias("p")).distinct().count()
        )
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    assert n_parts > 1, n_parts

    agg = out.agg(
        F.count("*").alias("n"),
        F.min("question_number").alias("mn"),
        F.max("question_number").alias("mx"),
        F.countDistinct("question_number").alias("d"),
        F.sum(F.when(F.col("question_text") != "", 1).otherwise(0)).alias("nb"),
    ).first()
    assert (agg.n, agg.mn, agg.mx, agg.d) == (n_q, 1, n_q, n_q)
    assert agg.nb == n_q  # every question kept its body text

    # spot-check one mid-stream question end-to-end
    mid = out.where(F.col("question_number") == 10_000).first()
    assert mid.question_text == "body 10000"
    assert [o["key"] for o in mid.options] == ["A", "B"]
    assert mid.answer_text == "A"


def test_auto_giant_dispatch_span_equal_on_mixed_corpus(spark):
    """DEFAULT extract_flat_spans / extract_questions on a corpus mixing
    normal docs with one doc above the giant threshold must route the
    outlier to the chunked engine (no single-task straggler) and emit
    spans identical to the dispatch-disabled packed path."""
    normal = [
        (f"mix-{i}", generate_doc_spans(9400 + i, mean_questions=6))
        for i in range(6)
    ]
    docs = spark.createDataFrame(normal, schema=schema.DOCUMENT_SPANS_EXT)
    # giant doc: build packed row from the line generator (threshold
    # overridden to 300 spans so the probe stays test-sized)
    giant = (
        _giant_lines(spark, 200, parts=4)
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("kind", "text", "media_ref", "offset", "page")
                )
            ).alias("spans")
        )
    )
    mixed = docs.unionByName(giant)

    def canon(df):
        return sorted(
            (r.doc_id, r.seq, r.order, r.question_number, r.section,
             r.kind, r.text, r.media_ref)
            for r in df.collect()
        )

    got = canon(pipeline.extract_flat_spans(mixed, giant_doc_spans=300))
    ref = canon(pipeline.extract_flat_spans(mixed, giant_doc_spans=None))
    assert got == ref and len(got) > 800

    qgot = sorted(
        map(tuple, pipeline.extract_questions(
            mixed, giant_doc_spans=300
        ).select("doc_id", "seq", "question_number", "question_text",
                 "answer_text", "anomaly_score").collect())
    )
    qref = sorted(
        map(tuple, pipeline.extract_questions(
            mixed, giant_doc_spans=None
        ).select("doc_id", "seq", "question_number", "question_text",
                 "answer_text", "anomaly_score").collect())
    )
    assert qgot == qref

    # the giant doc's branch really is the chunked engine: its rows key
    # on (doc_id, _chunk) in the physical plan
    p = (
        pipeline.extract_flat_spans(mixed, giant_doc_spans=300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_chunk" in p

    # AUTO mode: the probe must detect the outlier and build the same
    # dispatched plan without an explicit threshold
    old = pipeline.GIANT_DOC_SPANS
    pipeline.GIANT_DOC_SPANS = 300
    try:
        auto = canon(pipeline.extract_flat_spans(mixed))
        p_auto = (
            pipeline.extract_flat_spans(mixed)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        pipeline.GIANT_DOC_SPANS = old
    assert auto == ref
    assert "_chunk" in p_auto and "Union" in p_auto


def test_chunk_boundary_mid_question_sections_survive(spark):
    """A chunk cut between an option line and its images/answer must not
    reset section state (the (doc, seg) grouping carries it)."""
    spans = [
        {"kind": "text", "text": "Question: 1 intro", "media_ref": "",
         "offset": 0, "page": 1},
        {"kind": "text", "text": "A. first", "media_ref": "", "offset": 1,
         "page": 1},
        {"kind": "image", "text": "", "media_ref": "img://x", "offset": 2,
         "page": 1},
        {"kind": "text", "text": "more option text", "media_ref": "",
         "offset": 3, "page": 1},
        {"kind": "text", "text": "Answer: A", "media_ref": "", "offset": 4,
         "page": 1},
        {"kind": "text", "text": "Explanation: why", "media_ref": "",
         "offset": 5, "page": 1},
    ]
    docs = spark.createDataFrame([("b", spans)],
                                 schema=schema.DOCUMENT_SPANS_EXT)
    for cs in (1, 2, 3):
        q = pipeline.parse_raw(docs, engine="native", chunk_size=cs).first()
        assert q.options[0]["text"] == "first more option text", cs
        assert q.options[0]["images"] == ["img://x"], cs
        assert q.answer_text == "A" and q.explanation_text == "why", cs


def test_chunked_vkernel_equals_whole_doc(spark):
    """operators/chunked.py: anchor-aligned chunked parse must be ROW-
    EQUAL to the whole-document vectorized parse on the fault-injected
    generator corpus (covers cover-noise heads, solo artifacts,
    hotspots, images, preamble skip)."""
    from pdf_parser_python_spark import schema as S
    from pdf_parser_python_spark.operators import chunked
    from pdf_parser_python_spark.plans import pipeline
    from pdf_parser_python_spark.sources.spans import generate_doc_spans

    corpus = [
        (f"g-{i:03d}", generate_doc_spans(7000 + i, mean_questions=20))
        for i in range(40)
    ]
    df = spark.createDataFrame(corpus, schema=S.DOCUMENT_SPANS_EXT)
    whole = pipeline.extract_questions(df, giant_doc_spans=None)
    chunk = chunked.parse_giant_final(df, chunk_spans=7)  # many chunks

    key = lambda r: (r["doc_id"], r["seq"])
    a = {key(r): r.asDict(recursive=True) for r in whole.collect()}
    b = {key(r): r.asDict(recursive=True) for r in chunk.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])


def test_chunked_dispatch_end_to_end(spark):
    """extract_* auto-dispatch with the chunked-vkernel giant branch:
    a synthetic giant doc + normal corpus must equal the undispatched
    parse."""
    from pdf_parser_python_spark import schema as S
    from pdf_parser_python_spark.plans import pipeline
    from pdf_parser_python_spark.sources.spans import generate_doc_spans

    corpus = [
        (f"n-{i:02d}", generate_doc_spans(100 + i, mean_questions=6))
        for i in range(10)
    ]
    giant_spans = []
    off = 0
    for q in range(400):
        for line in (f"Question: {q + 1}", "body line", "A. one",
                     "B. two", "Answer: B"):
            giant_spans.append(
                {"kind": "text", "text": line, "media_ref": "",
                 "offset": off, "page": 1 + off // 50}
            )
            off += 1
    corpus.append(("zz-giant", giant_spans))
    df = spark.createDataFrame(corpus, schema=S.DOCUMENT_SPANS_EXT)

    import pdf_parser_python_spark.plans.pipeline as P
    old = P.GIANT_DOC_SPANS
    P.GIANT_DOC_SPANS = 500  # force the giant branch for zz-giant
    P._GIANT_PROBE_CACHE.clear()
    try:
        auto = pipeline.extract_flat_spans(df)
        plain = pipeline.extract_flat_spans(df, giant_doc_spans=None)
        key = lambda r: tuple(r)
        assert sorted(map(key, auto.collect())) == sorted(
            map(key, plain.collect())
        )
    finally:
        P.GIANT_DOC_SPANS = old
        P._GIANT_PROBE_CACHE.clear()


def test_chunked_vs_reference_random_compositions(spark):
    """Batched differential for the chunked engine: random adversarial
    line compositions (the fuzz WORDS pool: anchor lookalikes, solo
    artifacts, cover noise, unicode dialect torture) parsed with
    chunk_spans=3 — splits at nearly every safe anchor — must match the
    LIVE reference FSM question-for-question."""
    import random

    from pdf_parser_python_spark import schema as S
    from pdf_parser_python_spark.operators import chunked

    from .oracle import run_reference
    from .test_fuzz import WORDS

    pool = WORDS.elements  # the sampled_from value list
    rng = random.Random(0xC41C)
    docs, expected = [], {}
    for d in range(120):
        spans = []
        page = 1
        for off in range(rng.randint(4, 36)):
            if rng.random() < 0.12:
                spans.append({"kind": "image", "text": "",
                              "media_ref": f"img/{d}/{off}",
                              "offset": off, "page": page})
            else:
                lines = [
                    " ".join(rng.choice(pool)
                             for _ in range(rng.randint(1, 3)))
                    for _ in range(rng.randint(1, 3))
                ]
                spans.append({"kind": "text", "text": "\n".join(lines),
                              "media_ref": "", "offset": off,
                              "page": page})
            if rng.random() < 0.15:
                page += 1
        doc_id = f"rc-{d:03d}"
        docs.append((doc_id, spans))
        expected[doc_id] = run_reference(spans)

    df = spark.createDataFrame(docs, schema=S.DOCUMENT_SPANS_EXT)
    got: dict[str, list] = {d: [] for d, _ in docs}
    for r in chunked.parse_giant_final(df, chunk_spans=3).collect():
        got[r.doc_id].append(r)
    for doc_id, exp in expected.items():
        rows = sorted(got[doc_id], key=lambda r: r.seq)
        assert len(rows) == len(exp), doc_id
        for r, e in zip(rows, exp):
            assert r.question_number == e["question_number"], doc_id
            assert r.question_text == e["question_text"], doc_id
            assert r.answer_text == e["answer_text"], doc_id
            assert r.explanation_text == e["explanation_text"], doc_id
            assert [o.asDict() for o in r.options] == [
                {k: o[k] for k in ("key", "text", "is_correct", "images")}
                for o in e["options"]
            ], doc_id
            assert r.page_start == e["page_start"], doc_id
            assert r.page_end == e["page_end"], doc_id
            assert r.anomaly_score == e["anomaly_score"], doc_id
