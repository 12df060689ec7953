"""Partition-level segmentation kernel (the scale path).

Same FSM semantics as :mod:`.kernel` (reference
/root/reference/parser/state_machine.py:133-366) but restructured for
throughput at 10^12-document scale:

- ``repartition(doc_id)`` + ``sortWithinPartitions(doc_id, offset,
  line_no)`` makes every document a contiguous run inside a partition;
- ``mapInPandas`` consumes whole Arrow batches (~10k lines spanning
  many documents) instead of one pandas invocation per document —
  grouped-map overhead (~ms/group) disappears, which matters when the
  average document is small;
- one combined alternation regex classifies a line in a single C-level
  pass (the per-pattern cascade of the reference collapses into ordered
  alternation, which preserves its check order: question → hotspot →
  option → answer → explanation);
- FSM state (current question accumulator) is carried across batch
  boundaries within a partition — the only stateful seam, and it never
  crosses partitions because a document never does.

Input must be noise-prefiltered line rows (plans/pipeline.tokenize):
the always-ignore patterns are state-independent so they run JVM-side.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from ..functions import anchors as A

_ANCHOR_ALTERNATION = (
    r"Question\s*:?\s*(?P<qnum>\d+)"
    r"|(?P<hot>HOTSPOT)\s*$"
    r"|\(?(?P<okey>[A-Za-z])\s*[.):\-–—]\s*"
    r"|(?P<ans>(?:Correct\s+)?(?:Answer|Ans|Key))[\s.:]*"
    r"|(?P<exp>Explanation|Reference|Rationale|Solution)\s*:?\s*"
)

#: ordered alternation == the reference's check order (noise handled
#: upstream by the native tokenize filter)
_COMBINED = re.compile(r"^\s*(?:" + _ANCHOR_ALTERNATION + r")", re.IGNORECASE)

#: single-pass variant for the packed kernel: the always-ignore noise
#: check (reference state_machine.py:200-202 — noise wins over every
#: anchor) rides as the FIRST alternative, so one C-level regex pass
#: classifies a line completely. The two case-SENSITIVE noise rules
#: (separators, lone URLs) keep their sensitivity via (?-i:...).
_COMBINED_NOISE = re.compile(
    r"^\s*(?:(?P<noise>"
    + A.NOISE_CI_BODY
    + r"|(?-i:" + A.NOISE_CS_BODY + r"))"
    + r"|" + _ANCHOR_ALTERNATION + r")",
    re.IGNORECASE,
)
_COVER = A.RE_COVER_NOISE

_COLUMNS = [
    "doc_id", "seq", "question_number", "question_type", "question_text",
    "question_images", "options", "answer_text", "answer_images",
    "explanation_text", "explanation_images", "page_start", "page_end",
    "parse_failed",
]

# FSM states
_QBODY, _OPTION, _ANSWER, _EXPL = 0, 1, 2, 3


class _DocState:
    """Accumulator for one in-flight document."""

    __slots__ = ("doc_id", "seq", "state", "cur", "opt", "rows", "failed")

    def __init__(self, doc_id: str) -> None:
        self.doc_id = doc_id
        self.seq = 0
        self.state = _QBODY
        self.cur: list | None = None
        self.opt: list | None = None
        self.rows: list[tuple] = []
        self.failed = False

    def flush_question(self) -> None:
        q = self.cur
        self.rows.append(
            (
                self.doc_id, self.seq, q[0], q[1], " ".join(q[2]), q[3],
                [
                    {"key": k, "text": " ".join(t), "is_correct": False,
                     "images": im}
                    for (k, t, im) in q[4]
                ],
                " ".join(q[5]), q[6], " ".join(q[7]), q[8], q[9], q[10],
                False,
            )
        )
        self.seq += 1

    def finish(self) -> list[tuple]:
        if self.failed:
            return [(self.doc_id, 0, -1, "mcq", "", [], [], "", [], "", [],
                     1, 1, True)]
        if self.cur is not None:
            self.flush_question()
        return self.rows


def _process_rows(ds: _DocState, kinds, texts, medias, pages,
                  match=None) -> None:
    """Advance one document's FSM over a run of rows (already in order).

    ``match`` defaults to the noise-free classifier (for pre-filtered
    line streams); the packed kernel passes the fused noise-aware one.
    """
    match = match or _COMBINED.match
    cover = _COVER.match
    state = ds.state
    cur = ds.cur
    opt = ds.opt

    for i in range(len(kinds)):
        if kinds[i] == "image":
            if cur is None:
                continue  # pre-amble orphan image (:184-187)
            ref = medias[i]
            if state == _QBODY:
                cur[3].append(ref)
            elif state == _OPTION:
                opt[2].append(ref)
            elif state == _ANSWER:
                cur[6].append(ref)
            else:
                cur[8].append(ref)
            pg = pages[i]
            if pg > cur[10]:
                cur[10] = pg
            continue

        line = texts[i]
        m = match(line)
        if m is None:
            if cur is not None and line:
                if state == _QBODY:
                    cur[2].append(line)
                elif state == _OPTION:
                    opt[1].append(line)
                elif state == _ANSWER:
                    cur[5].append(line)
                else:
                    cur[7].append(line)
            continue

        g = m.lastgroup
        if g == "noise":
            continue  # always-ignored boilerplate (:200-202)
        if g == "qnum":
            rem = line[m.end():].strip()
            if ":" not in line and not rem:
                continue  # solo "Question N" artifact (:209-215)
            if cur is None and cover(line):
                continue  # cover-page noise pre-first-anchor (:276-280)
            if cur is not None:
                ds.cur = cur
                ds.flush_question()
            pg = pages[i]
            cur = [min(int(m.group("qnum")), A.QNUM_CAP), "mcq",
                   [], [], [], [], [], [], [], pg, pg]
            ds.cur = cur
            opt = None
            state = _QBODY
            if rem:
                cur[2].append(rem)
        elif cur is None:
            continue  # everything before the first anchor (:231-234)
        elif g == "hot":
            if state == _QBODY:
                cur[1] = "hotspot"
            elif state == _OPTION:
                opt[1].append(line)
            elif state == _ANSWER:
                cur[5].append(line)
            else:
                cur[7].append(line)
        elif g == "okey":
            if state in (_QBODY, _OPTION):
                opt = [m.group("okey").upper(), [], []]
                cur[4].append(opt)
                state = _OPTION
                rem = line[m.end():].strip()
                if rem:
                    opt[1].append(rem)
            elif state == _ANSWER:  # invalid anchor → plain text (:238)
                cur[5].append(line)
            else:
                cur[7].append(line)
        elif g == "ans":
            state = _ANSWER
            opt = None
            rem = line[m.end():].strip()
            if rem:
                cur[5].append(rem)
        else:  # exp
            state = _EXPL
            opt = None
            rem = line[m.end():].strip()
            if rem:
                cur[7].append(rem)

    ds.state = state
    ds.cur = cur
    ds.opt = opt


def parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas entrypoint over (doc_id, kind, text, media_ref,
    offset, line_no, page) rows sorted by (doc_id, offset, line_no)."""
    ds: _DocState | None = None
    out: list[tuple] = []

    for pdf in batches:
        doc_ids = pdf["doc_id"].to_numpy()
        kinds = pdf["kind"].to_numpy()
        texts = pdf["text"].fillna("").to_numpy()
        medias = pdf["media_ref"].fillna("").to_numpy()
        pages = pdf["page"].fillna(1).astype("int64").to_numpy()

        n = len(doc_ids)
        start = 0
        while start < n:
            doc = doc_ids[start]
            end = start
            while end < n and doc_ids[end] == doc:
                end += 1
            if ds is not None and ds.doc_id != doc:
                out.extend(ds.finish())
                ds = None
            if ds is None:
                ds = _DocState(doc)
            if not ds.failed:
                try:
                    _process_rows(
                        ds, kinds[start:end], texts[start:end],
                        medias[start:end], pages[start:end],
                    )
                except Exception:
                    ds.failed = True
            start = end

        if len(out) >= 1000:
            yield pd.DataFrame(out, columns=_COLUMNS)
            out = []

    if ds is not None:
        out.extend(ds.finish())
    if out:
        yield pd.DataFrame(out, columns=_COLUMNS)
    elif ds is None:
        yield pd.DataFrame({c: pd.Series(dtype=object) for c in _COLUMNS})
