"""Raw-document scan phase: binaryFile → blocks → filters → spans →
questions (SURVEY §2.1 S1-S4, F4-F7)."""

import os
import tempfile

import pytest

from pdf_parser_python_spark.plans import pipeline
from pdf_parser_python_spark.sources import pdfscan


@pytest.fixture(scope="module")
def scan_dir(spark):
    td = tempfile.mkdtemp()
    # doc A: two pages, out-of-order y coords (S4 must sort), one image
    pdfscan.write_spdf(os.path.join(td, "docA.spdf"), [
        [
            ("text", 10, 200, 500, 220, "A. first option"),
            ("text", 10, 100, 500, 130, "Question: 1\nWhat is X?"),
            ("text", 10, 300, 500, 320, "B. second option"),
        ],
        [
            ("image", 10, 50, 200, 150, 400, 300, "img/a1.png"),
            ("text", 10, 10, 500, 30, "Answer: B"),
        ],
    ])
    # doc B: filter torture — tiny image (F4), degenerate bbox (F6),
    # page over image cap (F7, cap lowered in test), repeated logo (F5)
    logo = [("image", 5, 5 + i, 60, 60 + i, 80, 80, "img/logo.png")
            for i in range(8)]
    many = [("image", 5, 100 + i, 300, 400 + i, 300, 300, f"img/m{i}.png")
            for i in range(6)]
    pdfscan.write_spdf(os.path.join(td, "docB.spdf"), [
        [
            ("text", 10, 1, 500, 20, "Question: 7"),
            ("text", 10, 2, 500, 25, "body"),
            ("image", 10, 30, 40, 31, 30, 30, "img/tiny.png"),      # F4
            ("image", 10, 40, 9, 39, 200, 200, "img/degen.png"),    # F6 (x1<x0)
            ("image", 10, 50, 300, 250, 500, 400, "img/keep.png"),
            ("text", 10, 400, 500, 420, "Answer: A"),
        ],
        logo + [("text", 10, 500, 500, 520, "Question: 8"),
                ("text", 10, 510, 500, 520, "b8"),
                ("text", 10, 550, 500, 560, "Answer: B")],
        many + [("text", 10, 900, 500, 920, "tail")],
    ])
    return td


def test_scan_sort_and_parse(spark, scan_dir):
    blocks = pdfscan.scan_blocks(spark, scan_dir + "/*.spdf")
    docs = pdfscan.blocks_to_documents(pdfscan.filter_blocks(blocks))
    qs = {(r.doc_id, r.question_number): r
          for r in pipeline.extract_questions(docs).collect()}
    a = qs[("docA", 1)]
    # S4: y-sort put the anchor before the options despite input order
    assert a.question_text == "What is X?"
    assert [o.key for o in a.options] == ["A", "B"]
    assert a.options[1].is_correct
    # image on page 2 lands before "Answer:" in reading order → option B
    assert a.options[1].images == [] or a.page_end == 2


def test_layout_filters(spark, scan_dir):
    blocks = pdfscan.scan_blocks(spark, scan_dir + "/*.spdf")
    kept = pdfscan.filter_blocks(blocks, page_image_cap=10, logo_max=5)
    refs = [r.media_ref for r in kept.where("kind='image'").collect()]
    assert "img/tiny.png" not in refs        # F4
    assert "img/degen.png" not in refs       # F6
    assert "img/keep.png" in refs            # survivor
    assert refs.count("img/logo.png") == 5   # F5: 8 occurrences → 5 kept

    capped = pdfscan.filter_blocks(blocks, page_image_cap=5, logo_max=5)
    refs5 = [r.media_ref for r in capped.where("kind='image'").collect()]
    assert not any(r.startswith("img/m") for r in refs5)   # F7: 6 > cap 5
    assert refs5.count("img/logo.png") == 0                # F7 hits page 2 too


def test_page_range_prune(spark, scan_dir):
    blocks = pdfscan.scan_blocks(spark, scan_dir + "/*.spdf",
                                 page_range=(1, 1))
    pages = {r.page for r in blocks.select("page").distinct().collect()}
    assert pages == {1}
