"""PII detection + redaction for training-data curation.

Native ``regexp_extract_all`` / ``regexp_replace`` Column expressions
only — the whole pass is map-only (zero Exchange, inside whole-stage
codegen), so it composes with the repetition/quality profile as a
single projection over the corpus scan. Reference scope: no
counterpart in the reference engine (per-PDF pipeline); extends the
training-data family for a 100-TB deployment.

Pattern dialect: every pattern is deliberately written in the common
subset of Java regex (Spark) and RE2 (the DuckDB oracle) — explicit
ASCII character classes, no backreferences, no lookaround, ``\\b``
only adjacent to ASCII word characters (the dialects agree there; see
functions/anchors.py for the full divergence notes).

Redaction order is fixed (email → ssn → phone → ipv4) and matters:
an IPv4-looking dotted quad can also match the dotted phone form, so
earlier, more-specific kinds must consume their text first. Counts
are measured on the RAW text per kind, so a span matching two kinds
counts once in each (documented, deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind → (pattern, replacement token), applied in THIS order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"(\+?[0-9]{1,2}[ .-])?(\([0-9]{3}\)|[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IPV4>",
    ),
]


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII kind in the raw text. ``regexp_count``
    (r8) runs the same non-overlapping Matcher.find loop as
    ``size(regexp_extract_all(...))`` but never materializes the match
    array — identical counts (these patterns cannot match empty), one
    less per-row allocation per kind."""
    pattern = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.regexp_count(col, F.lit(pattern)).cast("bigint")


def redact(col: Column, kinds: list[str] | None = None) -> Column:
    """Text with every PII match replaced by its ``<KIND>`` token, in
    the fixed documented order (subset and reorder via ``kinds`` at
    your own risk — order is part of the semantics)."""
    out = col
    for k, pattern, token in PII_PATTERNS:
        if kinds is not None and k not in kinds:
            continue
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_profile(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-doc PII counts + redacted text. Map-only projection."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    return documents.select(
        "doc_id",
        *[pii_count(c, k).alias(f"n_{k}") for k, _, _ in PII_PATTERNS],
        redact(c).alias("redacted"),
    )
