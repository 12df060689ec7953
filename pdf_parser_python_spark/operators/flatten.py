"""Canonical question → ordered span flattening (the equality contract).

Reference: ``_question_to_blocks`` (/root/reference/parser/crud.py:633-726).
Per question, in order: question text → question images → per option
(in stored order) "K. text" → that option's images → answer text →
answer images → explanation text → explanation images, with one dense
running ``order`` index. Span-sequence equality
``(kind, text, media_ref, order)`` against the reference is asserted on
this exact flattening.

Implemented entirely with Catalyst higher-order array functions — no
UDF, no shuffle: each question row maps to its span array, then
``posexplode`` yields the long form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPAN_T = "array<struct<section:string,kind:string,text:string,media_ref:string>>"


def _txt(section: str, text: Column) -> Column:
    """A single text span, or empty array when text is empty."""
    return F.when(
        text != "",
        F.array(
            F.struct(
                F.lit(section).alias("section"),
                F.lit("text").alias("kind"),
                text.alias("text"),
                F.lit("").alias("media_ref"),
            )
        ),
    ).otherwise(F.array().cast(_SPAN_T))


def _imgs(section: str, refs: Column) -> Column:
    return F.transform(
        refs,
        lambda m: F.struct(
            F.lit(section).alias("section"),
            F.lit("image").alias("kind"),
            F.lit("").alias("text"),
            m.alias("media_ref"),
        ),
    )


def question_spans(df: DataFrame) -> DataFrame:
    """Add a ``spans`` column holding the canonical ordered flatten."""
    # option content: "K. text" if text else "K." (crud.py:671-673)
    opt_spans = F.flatten(
        F.transform(
            "options",
            lambda o: F.concat(
                F.array(
                    F.struct(
                        F.lit("options").alias("section"),
                        F.lit("text").alias("kind"),
                        F.when(
                            o["text"] != "",
                            F.concat(o["key"], F.lit(". "), o["text"]),
                        )
                        .otherwise(F.concat(o["key"], F.lit(".")))
                        .alias("text"),
                        F.lit("").alias("media_ref"),
                    )
                ),
                _imgs("options", o["images"]),
            ),
        )
    )
    spans = F.concat(
        _txt("question", F.col("question_text")),
        _imgs("question", F.col("question_images")),
        opt_spans,
        _txt("answer", F.col("answer_text")),
        _imgs("answer", F.col("answer_images")),
        _txt("explanation", F.col("explanation_text")),
        _imgs("explanation", F.col("explanation_images")),
    )
    return df.withColumn("spans", spans)


def flat_spans(df: DataFrame) -> DataFrame:
    """Long-form output: one row per flattened span with dense order."""
    q = question_spans(df)
    return q.select(
        "doc_id",
        "seq",
        "question_number",
        F.posexplode("spans").alias("order", "s"),
    ).select(
        "doc_id",
        "seq",
        "question_number",
        F.col("s.section").alias("section"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("order").cast("int").alias("order"),
    )
