"""Physical-plan property tests: the scale guarantees are asserted,
not just documented — regressions that add shuffles or lift filters
above the Python barrier fail CI."""

import re

from pdf_parser_python_spark import schema
from pdf_parser_python_spark.operators.validate import validation_report
from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources.spans import generate_doc_spans


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [(f"pl-{i}", generate_doc_spans(100 + i, mean_questions=3))
         for i in range(4)],
        schema=schema.DOCUMENT_SPANS_EXT,
    )


def test_packed_engine_zero_shuffle(spark):
    # dispatch disabled: the packed small-doc path itself must stay
    # scan → mapInPandas with no exchange
    p = _plan(pipeline.extract_questions(_docs(spark),
                                         giant_doc_spans=None))
    assert p.count("Exchange") == 0
    assert p.count("MapInArrow") == 1 and p.count("MapInPandas") == 0
    assert "FlatMapGroupsInPandas" not in p


def test_default_dispatch_probe_and_forced_union(spark):
    """Default (auto) dispatch: a giant-free corpus gets the pure
    packed plan (probe says no outliers → no union overhead); a forced
    threshold builds the union with the anchor-chunked vectorized
    branch keyed on (doc_id, chunk)."""
    d = _docs(spark)
    p_auto = _plan(pipeline.extract_flat_spans(d))
    assert "MapInArrow" in p_auto and "Union" not in p_auto
    assert p_auto.count("Exchange") == 0

    p = _plan(pipeline.extract_flat_spans(d, giant_doc_spans=10))
    assert "MapInArrow" in p and "Union" in p
    import re as _re

    parts = _re.findall(r"hashpartitioning\(([^)]*)\)", p)
    assert any(
        "doc_id" in x and "chunk" in x for x in parts
    ), parts  # giant branch re-packs pseudo-docs on (doc_id, chunk)
    # the giant branch uses the SAME vectorized kernel (two MapInArrow
    # stages in the union), not the window-cascade native engine
    assert p.count("MapInArrow") == 2


def test_partition_engine_single_shuffle_filters_below_barrier(spark):
    p = _plan(pipeline.parse_raw(_docs(spark), engine="partition"))
    assert p.count("Exchange") == 1
    i_py = p.find("MapInPandas")
    i_rlike = p.find("RLIKE")
    assert 0 <= i_py < i_rlike  # noise filter runs before Python


def test_validation_single_shuffle(spark):
    p = _plan(validation_report(pipeline.extract_questions(
        _docs(spark), giant_doc_spans=None)))
    assert p.count("Exchange") == 1


def test_native_engine_no_python(spark):
    p = _plan(pipeline.parse_raw(_docs(spark), engine="native"))
    assert "MapInPandas" not in p and "FlatMapGroupsInPandas" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_parquet_scan_pruned(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "docs.parquet")
    d.write.parquet(path)
    read = spark.read.parquet(path)
    p = _plan(pipeline.extract_questions(read))
    m = re.search(r"ReadSchema: (\S+)", p)
    assert m and "doc_id" in m.group(1) and "spans" in m.group(1)
