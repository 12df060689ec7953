"""Property-based differential fuzzing: arbitrary interleavings of
anchor-ish, noisy, and junk lines must parse identically to the live
reference FSM. This is the strongest guard on classification order
and state-validity rules (hypothesis shrinks any divergence to a
minimal line sequence)."""

from hypothesis import given, settings, strategies as st

from pdf_parser_python_spark.operators.kernel import segment_kernel
from pdf_parser_python_spark.operators.pkernel import parse_partition
from pdf_parser_python_spark.functions import anchors as A

from .oracle import flatten_doc, run_reference

# building blocks chosen to collide with every anchor/noise pattern
WORDS = st.sampled_from([
    "Question", "question:", "Answer", "Ans", "Answers", "Key", "Keynote",
    "Explanation", "Reference:", "Solution", "Rationale", "HOTSPOT",
    "hotspot", "A.", "B)", "(C)", "D:", "E -", "a.", "Z.", "AA.", "1.",
    "Topic 1,", "12/463", "https://x.invalid/y", "----", "=====",
    "Questions and Answers PDF", "Box 1:", "text", "body", "B, C", "5",
    "Question 5", "Question: 5", "Question:5", "Question 5 extra",
    "Correct Answer: A", ":", ".", "", " ", "\tQuestion: 7\r",
    # zero-padded anchors: the value (not digit-string length) decides
    # the int64 clamp — '0...042' must parse as 42 in every engine
    "Question: 0005", "Question: 0000000000000000000000042",
    "Question 007:", "Question: 000",
    # unicode dialect torture: NBSP/Zs whitespace rides the vectorized
    # arrow path (PY_WS_CHARS rewrite); non-ASCII digits, İ/ı folds and
    # \b-adjacent non-ASCII words must route their doc to the python
    # kernel — all verified against the live reference either way
    "\xa0Question:\xa05\xa0", "Answer: B", "café body",
    "Question: ٣", "questİon: 5", "optıon text",
    "Thank you for yourété", "  ", " ",
    "Topic\xa07, after", "body\x85tail",
])

LINE = st.builds(
    lambda ws: " ".join(ws) if len(ws) > 1 else (ws[0] if ws else ""),
    st.lists(WORDS, min_size=0, max_size=4),
)

SPAN = st.one_of(
    st.builds(lambda t: ("text", t), LINE),
    st.builds(
        lambda t1, t2: ("text", t1 + "\n" + t2), LINE, LINE
    ),
    st.builds(lambda i: ("image", f"img/{i}.png"), st.integers(0, 5)),
)


def _spans(items):
    out = []
    for i, (kind, payload) in enumerate(items):
        out.append({
            "kind": kind,
            "text": payload if kind == "text" else "",
            "media_ref": payload if kind == "image" else "",
            "offset": i,
            "page": 1 + i // 7,
        })
    return out


def _kernel_flat(spans):
    """Run the shared FSM (pkernel path) in-process on one doc."""
    import pandas as pd

    rows = []
    for s in spans:
        if s["kind"] == "image":
            rows.append(("f", "image", "", s["media_ref"], s["offset"], 0,
                         s["page"]))
        else:
            for ln_no, ln in enumerate(s["text"].split("\n")):
                t = ln.strip()
                if not t or A.is_noise_line(t):
                    continue
                rows.append(("f", "text", t, "", s["offset"], ln_no,
                             s["page"]))
    pdf = pd.DataFrame(rows, columns=[
        "doc_id", "kind", "text", "media_ref", "offset", "line_no", "page"])
    out = []
    for batch in parse_partition(iter([pdf])) if len(pdf) else []:
        out.append(batch)
    import pandas as pd2
    if not out:
        return []
    all_rows = pd2.concat(out)
    qs = []
    for _, r in all_rows.sort_values("seq").iterrows():
        if r["parse_failed"]:
            continue
        qs.append(_finalize_py(r))
    return flatten_doc(qs)


def _finalize_py(r):
    """Python replica of the native finalize stage (only for fuzz
    comparison — production finalize is Column-native)."""
    import re as _re

    opts = [o for o in r["options"]
            if o["text"].strip() or o["images"]]
    expl = r["explanation_text"]
    if expl and A.is_noise_line(expl.strip()):
        expl = ""
    ans = r["answer_text"]
    is_hot = r["question_type"] == "hotspot"
    if ans.strip() and not is_hot:
        up = ans.strip().upper()
        if "," in up:
            keys = set()
            for part in up.split(","):
                keys.update(_re.findall(r"\b([A-Z])\b", part))
        else:
            keys = set(_re.findall(r"[A-Z]", up))
        valid = {o["key"].upper() for o in opts}
        final = keys & valid if valid else keys
        opts = [{**o, "is_correct": o["key"].upper() in final} for o in opts]
    return {
        "question_number": r["question_number"],
        "question_text": r["question_text"],
        "question_images": r["question_images"],
        "options": opts,
        "answer_text": ans,
        "answer_images": r["answer_images"],
        "explanation_text": expl,
        "explanation_images": r["explanation_images"],
    }


@given(st.lists(SPAN, min_size=1, max_size=25))
@settings(max_examples=300, deadline=None)
def test_fuzz_kernel_matches_reference(items):
    spans = _spans(items)
    expected = flatten_doc(run_reference(spans))
    got = _kernel_flat(spans)
    assert got == expected


def _arrays(spans):
    kinds = [s["kind"] for s in spans]
    texts = [s["text"] for s in spans]
    refs = [s["media_ref"] for s in spans]
    pages = [int(s.get("page") or 1) for s in spans]
    return kinds, texts, refs, pages


@given(st.lists(SPAN, min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_fuzz_fused_flat_kernel_matches_reference(items):
    """The fused packed→flat kernel (dkernel._parse_doc +
    _flatten_rows: F8/F9 + §1.4 flatten in Python) against the live
    reference FSM's finalized questions."""
    from pdf_parser_python_spark.operators import dkernel

    spans = _spans(items)
    expected = flatten_doc(run_reference(spans))
    raw = dkernel._parse_doc("f", *_arrays(spans))
    got = [(r[2], r[3], r[4], r[5], r[6], r[7])
           for r in dkernel._flatten_rows(raw)]
    assert got == expected


def _vkernel_batch(spans):
    import pyarrow as pa

    spans = sorted(spans, key=lambda s: s["offset"])
    return pa.RecordBatch.from_arrays(
        [
            pa.array(["f"], pa.string()),
            pa.array([[s["kind"] for s in spans]], pa.list_(pa.string())),
            pa.array([[s["text"] for s in spans]], pa.list_(pa.string())),
            pa.array([[s["media_ref"] for s in spans]],
                     pa.list_(pa.string())),
            pa.array([[s.get("page") or 1 for s in spans]],
                     pa.list_(pa.int32())),
        ],
        names=["doc_id", "kinds", "texts", "refs", "pages"],
    )


@given(st.lists(SPAN, min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_fuzz_vectorized_kernel_matches_reference(items):
    """The arrow/RE2/numpy kernel (operators/vkernel.py — the default
    extract_flat_spans path) against the live reference FSM."""
    from pdf_parser_python_spark.operators import vkernel

    spans = _spans(items)
    expected = flatten_doc(run_reference(spans))
    rows = []
    for b in vkernel.parse_docs_flat_arrow(iter([_vkernel_batch(spans)])):
        rows.extend(zip(*[c.to_pylist() for c in b.columns]))
    rows.sort(key=lambda r: (r[1], r[7]))  # (seq, order) = emission order
    got = [(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows]
    assert got == expected


@given(st.lists(SPAN, min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_fuzz_vectorized_final_matches_reference(items):
    """The arrow full-entity emitter (QUESTION_FINAL: options with J5
    marking, per-section images, anomalies with context, pages,
    computed fields) against the reference's finalized entities."""
    from pdf_parser_python_spark.operators import vkernel

    spans = _spans(items)
    exp = [
        (
            q["question_number"], q["question_type"], q["question_text"],
            [(o["key"], o["text"], o["is_correct"], o["images"])
             for o in q["options"]],
            q["answer_text"], q["explanation_text"],
            q["question_images"], q["answer_images"],
            q["explanation_images"],
            [(a["type"], a["severity"], a.get("context"))
             for a in q["anomalies"]],
            q["anomaly_score"], q["page_start"], q["page_end"],
        )
        for q in run_reference(spans)
    ]
    got = []
    for b in vkernel.parse_docs_final_arrow(iter([_vkernel_batch(spans)])):
        for r in b.to_pylist():
            got.append((
                r["question_number"], r["question_type"],
                r["question_text"],
                [(o["key"], o["text"], o["is_correct"], o["images"])
                 for o in r["options"]],
                r["answer_text"], r["explanation_text"],
                r["question_images"], r["answer_images"],
                r["explanation_images"],
                [(a["type"], a["severity"],
                  dict(a["context"]) if a["context"] is not None else None)
                 for a in r["anomalies"]],
                r["anomaly_score"], r["page_start"], r["page_end"],
            ))
    assert got == exp


@given(st.lists(SPAN, min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_fuzz_vectorized_validation_matches_pandas(items):
    """The arrow validation emitter against the (oracled) python
    _validate_doc twin on the same parse."""
    from pdf_parser_python_spark.operators import dkernel, vkernel

    spans = _spans(items)
    fins = [
        fin
        for raw in dkernel._parse_doc("f", *_arrays(spans))
        if (fin := dkernel._finalize_row(raw)) is not None
    ]
    rep = dkernel._validate_doc(fins)
    exp = [] if rep is None else [
        rep[:10] + (dict(rep[10]), rep[11])
    ]
    got = []
    for b in vkernel.validate_docs_arrow(iter([_vkernel_batch(spans)])):
        for r in b.to_pylist():
            got.append((
                r["doc_id"], r["total_questions_detected"],
                r["structured_successfully"],
                r["questions_missing_answer"],
                r["questions_missing_explanation"],
                r["failed_to_structure"], r["orphan_images"],
                r["missing_question_numbers"], r["gap_list_suppressed"],
                r["duplicate_question_numbers"],
                dict(r["anomaly_breakdown"]), r["success_rate"],
            ))
    assert got == exp


@given(st.lists(SPAN, min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_fuzz_fused_finalize_matches_reference(items):
    """The fused finalize (J5 answer marking, anomaly stamping incl.
    context, computed fields) against the reference's finalized
    entities."""
    from pdf_parser_python_spark.operators import dkernel

    spans = _spans(items)
    exp = [
        (
            q["question_number"], q["question_type"],
            [(o["key"], o["is_correct"]) for o in q["options"]],
            [(a["type"], a["severity"], a.get("context"))
             for a in q["anomalies"]],
            q["anomaly_score"], q["page_start"], q["page_end"],
        )
        for q in run_reference(spans)
    ]
    raw = dkernel._parse_doc("f", *_arrays(spans))
    got = []
    for r in raw:
        f = dkernel._finalize_row(r)
        if f is None:
            continue
        got.append((
            f[2], f[3],
            [(o["key"], o["is_correct"]) for o in f[6]],
            [(a["type"], a["severity"], a["context"]) for a in f[13]],
            f[14], f[11], f[12],
        ))
    assert got == exp
