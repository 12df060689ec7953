"""Batched state-machine segmentation kernel.

Semantics: /root/reference/parser/state_machine.py:133-366 (the 5-state
anchor FSM), re-built as a two-phase Arrow-batched kernel:

  phase A (vectorized): every regex decision — anchor class, captured
      question number / option key, anchor remainders, noise and
      cover-page masks — is computed with pandas ``.str`` ops over the
      whole per-document line frame at once;
  phase B (sequential): a tight loop over the precomputed int8 code
      array performs only state transitions and list appends. No regex,
      no string scanning, no attribute lookups in the loop.

The kernel runs under ``groupBy("doc_id").applyInPandas`` — one Arrow
batch per document group. It emits *raw* question rows; all finalize
rules (ghost-option filter, explanation scrub, correct-option marking,
anomaly stamping — state_machine.py:368-459) are native Column
expressions in :mod:`.finalize`, so they stay JVM-side.

Anchor-validity rules encoded in phase A/B (reference line cites):
- solo "Question N" without a colon is dropped everywhere (:209-215);
- option anchors are anchors only in QUESTION_BODY/OPTION state (:238);
- HOTSPOT is honored only in QUESTION_BODY state (:225-229);
- cover-page noise applies only before the first effective question
  anchor of the document (:276-280);
- everything before the first question anchor is preamble and dropped
  (:231-234), orphan pre-amble images included (:184-187).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import anchors as A

# row codes (phase A output)
TEXT = 0
QUESTION = 1
OPTION_CAND = 2
ANSWER = 3
EXPLANATION = 4
HOTSPOT_CAND = 5
IMAGE = 6
DROP = 7

# FSM states (phase B)
ST_QBODY = 0
ST_OPTION = 1
ST_ANSWER = 2
ST_EXPLANATION = 3

_QUESTION_RAW_COLUMNS = [
    "doc_id",
    "seq",
    "question_number",
    "question_type",
    "question_text",
    "question_images",
    "options",
    "answer_text",
    "answer_images",
    "explanation_text",
    "explanation_images",
    "page_start",
    "page_end",
    "parse_failed",
]


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in _QUESTION_RAW_COLUMNS})


def classify_lines(text: pd.Series) -> tuple[np.ndarray, np.ndarray, list]:
    """Phase A: vectorized anchor classification of stripped text lines.

    Returns ``(codes, qnums, payload)`` where payload[i] is the text
    fragment the row contributes to its section (anchor remainder for
    anchor rows, the full line for plain text) or the option key for
    option-candidate rows (as ``(key, remainder)``).
    """
    n = len(text)
    codes = np.zeros(n, dtype=np.int8)
    qnums = np.full(n, -1, dtype=np.int64)
    payload: list = list(text)

    if n == 0:
        return codes, qnums, payload

    # noise first (always ignored, any state): state_machine.py:200-202
    noise = text.str.match(A.RE_NOISE_CI) | text.str.match(A.RE_NOISE_CS)
    codes[noise.to_numpy()] = DROP

    live = ~noise

    # question anchors
    q = text.str.extract(A.RE_QUESTION, expand=False)
    q_hit = q.notna() & live
    solo = text.str.match(A.RE_SOLO_QUESTION) & ~text.str.contains(":", regex=False)
    q_real = q_hit & ~solo
    q_drop = q_hit & solo
    codes[q_real.to_numpy()] = QUESTION
    codes[q_drop.to_numpy()] = DROP
    qi = q_real.to_numpy().nonzero()[0]
    if len(qi):
        # clamp numbers beyond int64 range to QNUM_CAP before the cast —
        # astype would raise otherwise. Clamp on the numeric VALUE (strip
        # leading zeros first), matching the reference's plain int()
        # (state_machine.py:217): '0...05' is 5, not a 19-digit string.
        qs = q[q_real]
        qs = qs.mask(qs.str.lstrip("0").str.len() > 18, str(A.QNUM_CAP))
        qnums[qi] = qs.astype(np.int64).to_numpy()
        rem = text[q_real].str.replace(A.RE_QUESTION, "", n=1, regex=True).str.strip()
        for i, r in zip(qi, rem):
            payload[i] = r

    rest = live & ~q_hit

    # HOTSPOT candidates (validity = state, resolved in phase B)
    hot = text.str.match(A.RE_HOTSPOT) & rest
    codes[hot.to_numpy()] = HOTSPOT_CAND
    rest &= ~hot

    # option candidates
    okey = text.str.extract(A.RE_OPTION, expand=False)
    o_hit = okey.notna() & rest
    oi = o_hit.to_numpy().nonzero()[0]
    codes[oi] = OPTION_CAND
    if len(oi):
        orem = text[o_hit].str.replace(A.RE_OPTION, "", n=1, regex=True).str.strip()
        # payload = (key, remainder, original line); the original line is
        # needed when the anchor is invalid in the current state and the
        # reference appends the untouched line as plain text (:238, :267)
        for i, k, r, full in zip(oi, okey[o_hit].str.upper(), orem, text[o_hit]):
            payload[i] = (k, r, full)
    rest &= ~o_hit

    # answer anchors
    ans = text.str.match(A.RE_ANSWER) & rest
    ai = ans.to_numpy().nonzero()[0]
    codes[ai] = ANSWER
    if len(ai):
        arem = text[ans].str.replace(A.RE_ANSWER, "", n=1, regex=True).str.strip()
        for i, r in zip(ai, arem):
            payload[i] = r
    rest &= ~ans

    # explanation anchors
    exp = text.str.match(A.RE_EXPLANATION) & rest
    ei = exp.to_numpy().nonzero()[0]
    codes[ei] = EXPLANATION
    if len(ei):
        erem = text[exp].str.replace(A.RE_EXPLANATION, "", n=1, regex=True).str.strip()
        for i, r in zip(ei, erem):
            payload[i] = r

    return codes, qnums, payload


def _parse_one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    doc_id = pdf["doc_id"].iat[0]
    pdf = pdf.sort_values(["offset", "line_no"], kind="stable")

    kinds = pdf["kind"].to_numpy()
    is_image = kinds == "image"
    pages = pdf["page"].fillna(1).astype(np.int64).to_numpy()
    media = pdf["media_ref"].to_numpy()

    text = pdf["text"].where(~is_image, "").fillna("").astype(str)
    codes, qnums, payload = classify_lines(text)
    codes[is_image] = IMAGE

    # cover-page noise: active only before the first effective question
    # anchor; an anchor line matching cover-noise before that point is
    # itself filtered (state_machine.py:276-280).
    cover = (text.str.match(A.RE_COVER_NOISE) & ~is_image).to_numpy()
    q_pos = ((codes == QUESTION) & ~cover).nonzero()[0]
    if len(q_pos) == 0:
        return _empty_out()
    first = q_pos[0]
    # drop preamble entirely: pre-anchor text is never appended and
    # pre-anchor images are orphans (state_machine.py:184-187, 231-234)
    codes = codes[first:]
    qnums = qnums[first:]
    payload = payload[first:]
    pages = pages[first:]
    media = media[first:]

    # ── phase B: transition loop over precomputed codes ──
    out: list[tuple] = []
    seq = 0
    state = ST_QBODY
    cur: list | None = None  # current question accumulator
    # accumulator layout:
    # [qnum, qtype, qtext[], qimgs[], options[(key, txt[], imgs[])],
    #  atext[], aimgs[], etext[], eimgs[], page_start, page_end]
    cur_opt: list | None = None

    def flush() -> None:
        nonlocal seq
        q = cur
        out.append(
            (
                doc_id,
                seq,
                int(q[0]),
                q[1],
                " ".join(q[2]),
                q[3],
                [
                    {"key": k, "text": " ".join(t), "is_correct": False, "images": im}
                    for (k, t, im) in q[4]
                ],
                " ".join(q[5]),
                q[6],
                " ".join(q[7]),
                q[8],
                int(q[9]),
                int(q[10]),
                False,
            )
        )
        seq += 1

    for i in range(len(codes)):
        c = codes[i]
        if c == TEXT:
            frag = payload[i]
            if not frag:
                continue
            if state == ST_QBODY:
                cur[2].append(frag)
            elif state == ST_OPTION:
                cur_opt[1].append(frag)
            elif state == ST_ANSWER:
                cur[5].append(frag)
            else:
                cur[7].append(frag)
        elif c == QUESTION:
            if cur is not None:
                flush()
            pg = int(pages[i])
            cur = [qnums[i], "mcq", [], [], [], [], [], [], [], pg, pg]
            cur_opt = None
            state = ST_QBODY
            frag = payload[i]
            if frag:
                cur[2].append(frag)
        elif c == OPTION_CAND:
            if state in (ST_QBODY, ST_OPTION):
                key, frag, _ = payload[i]
                cur_opt = [key, [], []]
                cur[4].append(cur_opt)
                state = ST_OPTION
                if frag:
                    cur_opt[1].append(frag)
            else:
                # option anchor invalid in ANSWER/EXPLANATION state →
                # the untouched line is plain section text (:238, :267)
                _, _, full = payload[i]
                if state == ST_ANSWER:
                    cur[5].append(full)
                else:
                    cur[7].append(full)
        elif c == ANSWER:
            state = ST_ANSWER
            cur_opt = None
            frag = payload[i]
            if frag:
                cur[5].append(frag)
        elif c == EXPLANATION:
            state = ST_EXPLANATION
            cur_opt = None
            frag = payload[i]
            if frag:
                cur[7].append(frag)
        elif c == HOTSPOT_CAND:
            if state == ST_QBODY:
                cur[1] = "hotspot"
            else:
                frag = payload[i]
                if state == ST_OPTION:
                    cur_opt[1].append(frag)
                elif state == ST_ANSWER:
                    cur[5].append(frag)
                else:
                    cur[7].append(frag)
        elif c == IMAGE:
            ref = media[i]
            if state == ST_QBODY:
                cur[3].append(ref)
            elif state == ST_OPTION:
                cur_opt[2].append(ref)
            elif state == ST_ANSWER:
                cur[6].append(ref)
            else:
                cur[8].append(ref)
            pg = int(pages[i])
            if pg > cur[10]:
                cur[10] = pg
        # DROP: nothing

    if cur is not None:
        flush()

    return pd.DataFrame(out, columns=_QUESTION_RAW_COLUMNS)


def segment_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas entrypoint: one document group → raw question rows.

    Never raises (north-rule: malformed docs must not fail the job):
    a document whose parse throws emits a single sentinel row with
    ``parse_failed=True`` and ``question_number=-1`` which downstream
    stages filter out but the metrics layer counts.
    """
    try:
        return _parse_one_doc(pdf)
    except Exception:
        doc_id = pdf["doc_id"].iat[0] if len(pdf) else ""
        return pd.DataFrame(
            [(doc_id, 0, -1, "mcq", "", [], [], "", [], "", [], 1, 1, True)],
            columns=_QUESTION_RAW_COLUMNS,
        )
