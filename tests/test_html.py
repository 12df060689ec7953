"""HTML main-content lane (operators/html.py): boilerplate strip,
DOM-density heuristics, engine agreement, input-table shape."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_python_spark.operators import html as H  # noqa: E402

SF = "/root/testdata/sf0.001"


def _spans(spark, pages, engine="native"):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pages)], "doc_id bigint, html string"
    )
    rows = H.html_to_spans(df, engine=engine).collect()
    return sorted((r.doc_id, r.offset, r.kind, r.text, r.media_ref)
                  for r in rows)


CHROME = (
    '<html><head><title>t</title><style>x</style>'
    '<script>var s="</p>"</script></head><body>'
    '<nav><a href="/">home</a></nav><header><h1>site head</h1></header>'
    "{body}"
    '<aside><p>related stories sidebar</p></aside>'
    '<footer>contact us legal</footer></body></html>'
)


def test_boilerplate_stripped(spark):
    got = _spans(spark, [CHROME.format(
        body="<p>the actual article body text</p>")])
    assert got == [(0, 0, "text", "the actual article body text", "")]


def test_comment_and_inline_markup(spark):
    got = _spans(spark, [CHROME.format(
        body='<!-- ad slot --><p>before <a href="/x">tiny</a> after'
             " padding words</p>")])
    assert got == [(0, 0, "text", "before tiny after padding words", "")]


def test_link_density_and_min_text_drop(spark):
    body = (
        '<div><a href="/1">one link</a> <a href="/2">two link</a></div>'
        "<div>stub</div>"
        "<p>a genuine paragraph of content</p>"
    )
    got = _spans(spark, [CHROME.format(body=body)])
    assert got == [(0, 0, "text", "a genuine paragraph of content", "")]


def test_media_and_heading_spans(spark):
    body = ('<h2>section heading</h2><img src="img://a/1">'
            "<p>paragraph under the heading</p>")
    got = _spans(spark, [CHROME.format(body=body)])
    assert got == [
        (0, 0, "heading", "section heading", ""),
        (0, 1, "media", "", "img://a/1"),
        (0, 2, "text", "paragraph under the heading", ""),
    ]


def test_null_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "<p>surviving real content</p>")],
        "doc_id bigint, html string",
    )
    for engine in ("native", "arrow"):
        rows = H.html_to_spans(df, engine=engine).collect()
        assert [(r.doc_id, r.text) for r in rows] == [
            (2, "surviving real content")
        ]


def test_engines_agree_on_corpus(spark):
    hdf = H.synth_html(spark.read.parquet(f"{SF}/documents.parquet"))
    nat = sorted(map(tuple, H.html_to_spans(hdf).collect()))
    arw = sorted(map(tuple, H.html_to_spans(hdf, engine="arrow").collect()))
    assert nat == arw
    assert len(nat) > 1000
    kinds = {t[2] for t in nat}
    assert kinds == {"text", "heading", "media"}


def test_native_plan_stays_jvm_side(spark):
    hdf = H.synth_html(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = H.html_to_spans(hdf)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    # filtered-array posexplode: extraction is map-only, zero shuffles
    assert "Exchange" not in plan


def test_spans_to_docs_input_shape(spark):
    hdf = H.synth_html(
        spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    )
    docs = H.spans_to_docs(H.html_to_spans(hdf))
    f = docs.schema["spans"].dataType.elementType
    assert [x.name for x in f.fields] == ["kind", "text", "media_ref",
                                          "offset"]
    row = docs.orderBy("doc_id").first()
    offs = [s["offset"] for s in row.spans]
    assert offs == sorted(offs) and offs[0] == 0


def test_main_content_counts(spark):
    hdf = H.synth_html(spark.read.parquet(f"{SF}/documents.parquet"))
    mc = H.main_content(H.html_to_spans(hdf))
    bad = mc.where(
        (mc.n_chars < 0) | (mc.n_text + mc.n_headings + mc.n_media == 0)
    ).count()
    assert bad == 0
    assert mc.count() == 500


def test_bad_engine_rejected(spark):
    df = spark.createDataFrame([(0, "<p>x</p>")], "doc_id bigint, html string")
    with pytest.raises(ValueError):
        H.html_to_spans(df, engine="bogus")
