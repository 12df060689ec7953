"""Deterministic synthetic SPDF corpus — every value is a pure
integer function of (doc, page, index), so a DuckDB oracle can
regenerate the exact corpus from ``range()`` and replay the whole
scan → filter → re-index pipeline in SQL (the same trick
``operators/media.synthetic_media`` uses for the multimodal path).

This is what lets the pdfscan family (S1 page scan, S2 page-range,
S3 image extract, S4 per-page sort + global re-index, F4 min-size,
F5 logo-repeat, F6 degenerate-bbox, F7 per-page cap, A12 running
image-hash count — reference /root/reference/parser/
block_extractor.py:57-357) be hash-checked by the driver gate
instead of only pytest-covered.

Corpus shape (doc d in 0..D-1, page p in 1..P, 1-indexed):

- ``P = 2 + d % 3`` pages per doc;
- text blocks ``k in 0..(3 + (d+p) % 4)-1``:
  ``x0 = 2*((k*37 + p*11 + d*7) % 200)`` (even), ``y0 = (k*53 +
  p*17) % 600``, ``x1 = x0 + 50 + k``, ``y1 = y0 + 12``,
  text ``"doc {d} page {p} block {k}"``;
- normal images ``m in 0..M-1`` with ``M = (d+p) % 4`` — except doc
  0 page 1, which carries ``M = 8`` large images so the per-page cap
  (F7, cap=6 in the driver query) provably fires:
  ``x0 = 2*((m*41 + p*13 + d) % 200) + 1`` (odd — never ties with a
  text block), ``y0 = (m*59 + d*3 + p*29) % 700``,
  pixel dims ``w = 30 + (d + m*29) % 60`` (< 50 → F4 drops),
  ``h = 55 + (m*13 + p) % 40``; bbox width ``0`` when
  ``(d+m) % 7 == 0`` (degenerate → F6 drops) else ``60 + m``; doc 0
  page 1 overrides ``w = 60 + m``, ``h = 60``, bbox width
  ``50 + m`` so all 8 survive F4/F6 and trip the cap;
- "logo" images on docs ``d % 5 == 1``: two per page (``j in
  0..1``) at ``(x0, y0) = (11, 700 + 5*j)``, ref ``"logo"``,
  ``w = h = 60``, bbox 30×20 (area 600 < 10,000) — docs with
  enough pages exceed ``logo_max = 5`` occurrences and the
  F5 running-count filter drops the tail.

(page, y0, x0) is unique within a doc by construction (text x0
even, normal-image x0 odd with y0 < 700, logos at y0 >= 700), so
the S4/W1 row_number re-index is a total order and the oracle is
exact.
"""

from __future__ import annotations

import os
import tempfile


def _doc_lines(d: int) -> list[str]:
    lines = ["SPDF"]
    n_pages = 2 + d % 3
    for p in range(1, n_pages + 1):
        lines.append("@page 612 792")
        for k in range(3 + (d + p) % 4):
            x0 = 2 * ((k * 37 + p * 11 + d * 7) % 200)
            y0 = (k * 53 + p * 17) % 600
            lines.append(
                f"@text {x0} {y0} {x0 + 50 + k} {y0 + 12} "
                f"doc {d} page {p} block {k}"
            )
        n_imgs = 8 if (d == 0 and p == 1) else (d + p) % 4
        for m in range(n_imgs):
            x0 = 2 * ((m * 41 + p * 13 + d) % 200) + 1
            y0 = (m * 59 + d * 3 + p * 29) % 700
            if d == 0 and p == 1:
                w, h, bw = 60 + m, 60, 50 + m
            else:
                w = 30 + (d + m * 29) % 60
                h = 55 + (m * 13 + p) % 40
                bw = 0 if (d + m) % 7 == 0 else 60 + m
            ref = f"im{(d * 3 + p + m) % 5}"
            lines.append(
                f"@image {x0} {y0} {x0 + bw} {y0 + 25} {w} {h} {ref}"
            )
        if d % 5 == 1:
            for j in range(2):
                lines.append(
                    f"@image 11 {700 + 5 * j} 41 {700 + 5 * j + 20} "
                    f"60 60 logo"
                )
    return lines


def synthetic_spdf_corpus(n_docs: int = 40, base_dir: str | None = None) -> str:
    """Write the deterministic corpus (idempotent) and return its
    glob. Files land under a version-keyed tmp dir so repeated driver
    queries reuse the same bytes."""
    root = base_dir or os.path.join(tempfile.gettempdir(), f"spdf_v1_{n_docs}")
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        for d in range(n_docs):
            path = os.path.join(root, f"sdoc{d:04d}.spdf")
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write("\n".join(_doc_lines(d)))
            os.replace(tmp, path)
        with open(done, "w") as fh:
            fh.write(str(n_docs))
    return os.path.join(root, "*.spdf")
