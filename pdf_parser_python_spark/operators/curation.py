"""Composite corpus-curation filter: Gopher-style keep/drop rules.

Composes the quality score (``textstats.quality_score``), the
stopword language guess (``textstats.lang_guess``), token counts, and
the repetition profile (``operators/repetition.py``) into one
keep/drop decision with machine-readable reasons — the standard final
gate of an LLM training-data pipeline (Gopher §A1.1, C4, Dolma all
ship a variant). Reference scope: no counterpart in the reference
engine; extends the training-data family.

The whole filter is ONE map-only projection (zero Exchange): every
rule is a per-row expression over per-row metrics, so the gate runs
at corpus-scan speed and the corpus is never shuffled. ``reasons`` is
a comma-joined string in fixed rule order (deterministic across
engines and partitionings; empty string = keep).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .repetition import line_repetition, ngram_repetition, word_ngrams
from .textstats import lang_guess, quality_score, token_count

#: rule names in evaluation order (part of the output contract).
RULES = ("low_quality", "lang", "dup_lines", "repetitive_ngram", "too_short")


def curation_filter(
    documents: DataFrame,
    text_col: str = "text",
    min_quality: int = 70,
    langs: tuple[str, ...] = ("en",),
    max_dup_line_frac: float = 0.2,
    max_top_ngram_char_frac: float = 0.12,
    min_tokens: int = 20,
    n: int = 2,
    lines: Column | None = None,
    engine: str = "native",
    line_width: int | None = None,
) -> DataFrame:
    """Per-doc curation verdict: metrics, failed-rule ``reasons``
    (comma-joined, fixed order), and a ``keep`` flag.

    Defaults are tuned on the sf test corpus so each rule fires on a
    real slice; production thresholds are corpus decisions — pass your
    own. ``lines`` as in :func:`repetition.repetition_profile`
    (native engine only).

    ``engine="arrow"`` swaps the repetition metrics to the Arrow
    kernel (measured ~8× on the whole gate at 10⁶ docs, BENCH.md)
    while quality/lang/token stay NATIVE and ride THROUGH the kernel
    as passthrough columns — still one MapInPandas, zero Exchange, and
    no doc_id re-join. ``line_width`` selects chunked pseudo-lines for
    the arrow engine (None = split on newlines)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    if engine == "arrow":
        from .repetition import repetition_profile_arrow

        staged = documents.select(
            "doc_id",
            c.alias("_text"),
            quality_score(c).cast("bigint").alias("quality"),
            lang_guess(c).alias("lang_guess"),
            token_count(c).cast("bigint").alias("n_tokens"),
        )
        m = repetition_profile_arrow(
            staged,
            text_col="_text",
            n=n,
            line_width=line_width,
            passthrough=["quality", "lang_guess", "n_tokens"],
        ).select(
            "doc_id",
            "quality",
            "lang_guess",
            "n_tokens",
            "dup_line_frac",
            "top_ngram_char_frac",
        )
    else:
        if lines is None:
            lines = F.filter(
                F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
                lambda x: x != "",
            )
        staged = documents.select(
            "doc_id",
            c.alias("_text"),
            lines.alias("_lns"),
            word_ngrams(c, n).alias("_grams"),
        )
        lr = line_repetition(F.col("_lns"))
        nr = ngram_repetition(F.col("_text"), n, grams=F.col("_grams"))
        t = F.col("_text")
        m = staged.select(
            "doc_id",
            quality_score(t).cast("bigint").alias("quality"),
            lang_guess(t).alias("lang_guess"),
            token_count(t).cast("bigint").alias("n_tokens"),
            lr["dup_line_frac"].alias("dup_line_frac"),
            nr["top_ngram_char_frac"].alias("top_ngram_char_frac"),
        )
    checks = [
        (F.col("quality") < min_quality, "low_quality"),
        (~F.col("lang_guess").isin(*langs), "lang"),
        (F.col("dup_line_frac") > max_dup_line_frac, "dup_lines"),
        (
            F.col("top_ngram_char_frac") > max_top_ngram_char_frac,
            "repetitive_ngram",
        ),
        (F.col("n_tokens") < min_tokens, "too_short"),
    ]
    reasons = F.concat_ws(
        ",",
        *[F.when(cond, F.lit(name)) for cond, name in checks],
    )
    return m.select(
        "*",
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )
