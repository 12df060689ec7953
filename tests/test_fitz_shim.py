"""The real-PDF decode branch (_parse_fitz), driven by a fitz-shaped
shim: asserts block-level parity with the SPDF test codec on the same
layout, page-range pruning, the per-page image cap, xref caching and
hidden-xref behavior. PyMuPDF itself is not in this container — the
shim reproduces exactly the API surface the branch touches
(open/page_count/__getitem__/get_images/extract_image/get_image_rects/
get_text)."""

import hashlib

from pdf_parser_python_spark.sources import pdfscan


class _Rect:
    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1


class _ShimPage:
    def __init__(self, doc, texts, images):
        self._doc = doc
        self._texts = texts      # list of (x0,y0,x1,y1, text)
        self._images = images    # list of (xref, rects)

    def get_images(self, full=False):
        return [(xref, 0, 0, 0, 0, "", "", "", "") for xref, _ in self._images]

    def get_image_rects(self, xref):
        for x, rects in self._images:
            if x == xref:
                return [_Rect(*r) for r in rects]
        return []

    def get_text(self, kind, flags=0):
        assert kind == "dict"
        return {
            "blocks": [
                {
                    "type": 0,
                    "bbox": (x0, y0, x1, y1),
                    "lines": [
                        {"spans": [{"text": part}]}
                        for part in text.split("\n")
                    ],
                }
                for (x0, y0, x1, y1, text) in self._texts
            ]
        }


class _ShimDoc:
    def __init__(self, pages, xrefs):
        self._pages = [_ShimPage(self, t, i) for t, i in pages]
        self._xrefs = xrefs  # xref -> (w, h, payload bytes) or None
        self.page_count = len(self._pages)
        self.extract_calls = []

    def __getitem__(self, idx):
        return self._pages[idx]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def extract_image(self, xref):
        self.extract_calls.append(xref)
        meta = self._xrefs.get(xref)
        if meta is None:
            return None
        w, h, data = meta
        return {"width": w, "height": h, "image": data, "ext": "png"}


class _ShimFitz:
    TEXT_PRESERVE_WHITESPACE = 8

    def __init__(self, doc):
        self._doc = doc

    def open(self, stream=None, filetype=None):
        return self._doc


def _shim_doc():
    """Two pages mirroring an SPDF fixture: page 1 text+image, page 2
    text + a second instance of the same xref + an undecodable xref."""
    return _ShimDoc(
        pages=[
            (
                [(72, 100, 400, 120, "Question: 1 What is it?"),
                 (72, 140, 400, 160, "A. first\nB. second")],
                [(11, [(100, 200, 300, 350)])],
            ),
            (
                [(72, 90, 400, 110, "Answer: A")],
                [(11, [(100, 50, 300, 200)]),    # cached xref reused
                 (12, []),                        # hidden: no rects
                 (13, [(0, 0, 10, 10)])],         # extract returns None
            ),
        ],
        xrefs={11: (640, 480, b"image-11-bytes"), 12: (64, 64, b"x12"),
               13: None},
    )


def _spdf_equiv() -> bytes:
    h = hashlib.md5(b"image-11-bytes").hexdigest()
    ref = f"img://doc1/{h[:16]}"
    pages = [
        [("image", 100, 200, 300, 350, 640, 480, ref),
         ("text", 72, 100, 400, 120, "Question: 1 What is it?"),
         ("text", 72, 140, 400, 160, "A. first\nB. second")],
        [("image", 100, 50, 300, 200, 640, 480, ref),
         ("text", 72, 90, 400, 110, "Answer: A")],
    ]
    lines = ["SPDF"]
    for page in pages:
        lines.append("@page 612 792")
        for d in page:
            if d[0] == "text":
                lines.append(f"@text {d[1]} {d[2]} {d[3]} {d[4]} "
                             + d[5].replace("\n", "\\n"))
            else:
                lines.append(f"@image {d[1]} {d[2]} {d[3]} {d[4]} {d[5]} "
                             f"{d[6]} {d[7]}")
    return "\n".join(lines).encode()


def _key(row):
    # (kind, text, page, bbox, dims) — media naming differs by design
    # (fitz refs are content-addressed), img_hash basis differs (payload
    # bytes vs ref string), so compare the layout-structural fields.
    return (row[1], row[2], row[4], row[5], row[6], row[7], row[8],
            row[9], row[10])


def test_fitz_branch_matches_spdf_blocks():
    doc = _shim_doc()
    fz = pdfscan._parse_fitz("doc1", b"%PDF-shim", fitz_mod=_ShimFitz(doc))
    sp = pdfscan._parse_spdf("doc1", _spdf_equiv())
    assert sorted(map(_key, fz)) == sorted(map(_key, sp))
    # xref cache: image 11 decoded once despite appearing on two pages;
    # media_ref identical across instances (content-addressed)
    assert doc.extract_calls.count(11) == 1
    refs = {r[3] for r in fz if r[1] == "image"}
    assert refs == {f"img://doc1/{hashlib.md5(b'image-11-bytes').hexdigest()[:16]}"}


def test_fitz_page_range_prune():
    doc = _shim_doc()
    fz = pdfscan._parse_fitz("doc1", b"%PDF", page_range=(2, 9),
                             fitz_mod=_ShimFitz(doc))
    assert {r[4] for r in fz} == {2}


def test_fitz_page_image_cap():
    doc = _ShimDoc(
        pages=[(
            [(0, 0, 10, 10, "some text")],
            [(100 + i, [(0, 0, 50, 50)]) for i in range(5)],
        )],
        xrefs={100 + i: (100, 100, b"p%d" % i) for i in range(5)},
    )
    fz = pdfscan._parse_fitz("d", b"%PDF", page_image_cap=3,
                             fitz_mod=_ShimFitz(doc))
    kinds = [r[1] for r in fz]
    assert kinds == ["text"]  # over-cap page keeps no images
    assert doc.extract_calls == []  # and never decodes them


def test_fitz_through_distributed_pipeline(spark, tmp_path):
    """End-to-end: shim-decoded blocks → native filters → documents →
    extraction (the same downstream path the SPDF codec uses)."""
    doc = _shim_doc()
    rows = pdfscan._parse_fitz("doc1", b"%PDF", fitz_mod=_ShimFitz(doc))
    blocks = spark.createDataFrame(rows, schema=pdfscan.BLOCK)
    docs = pdfscan.blocks_to_documents(pdfscan.filter_blocks(blocks))
    from pdf_parser_python_spark.plans import pipeline

    qs = pipeline.extract_questions(docs).collect()
    assert len(qs) == 1
    q = qs[0]
    assert q.question_number == 1
    assert [o.key for o in q.options] == ["A", "B"]
    # reading order: both image instances sort after option B's anchor
    # (page-1 y0=200 > options y0=140; page-2 y0=50 < answer y0=90), so
    # both attach to option B — section ownership by FSM state, F5/J5
    assert q.question_images == [] and q.answer_images == []
    assert len(q.options[1].images) == 2
    assert q.image_count == 2 and q.page_end == 2
