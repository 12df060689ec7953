"""Data-mixture planning and deterministic sampling: the stage between
curation and packing that turns per-source mixture WEIGHTS (the
"40% web, 30% code, ..." recipe every LLM training run starts from)
into an executable per-source sampling plan, then materializes the
sampled corpus reproducibly at any cluster size.

Two operators:

- :func:`mixture_plan` — per-source token inventory (one tiny
  aggregate over the corpus) joined with the weight recipe →
  ``tokens_target``, whole-corpus repeat count ``n_epochs`` and the
  fractional remainder as an integer ``residual_ppm`` (parts per
  million). Integer ppm instead of a float rate keeps the plan
  hash-identical across engines and avoids float-compare drift in the
  sampler.
- :func:`mixture_sample` — executes a plan: every document is kept
  ``n_epochs`` times plus one more iff its 60-bit content hash lands
  under ``residual_ppm`` (md5-derived, so the SAME docs are chosen on
  any partitioning, any cluster size, and in the DuckDB oracle).
  Upsampling is an ``explode(sequence(...))`` — map-only, no shuffle,
  no ``rand()`` (rand is partition-order-dependent and breaks resume).

Scale shape: the plan aggregate is one shuffle over #sources groups
(map-side combined); the sampler is a broadcast join of the #sources-
row plan onto the corpus followed by a filter/explode — zero wide
exchanges over the corpus itself, so it composes with the curation
gate and packing stages without adding a corpus shuffle.

Reference scope: no counterpart in the reference engine (its sampling
is ``random.sample`` in laravel_bridge.py:108-128, nondeterministic);
extends the training-data family like operators/packing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_64
from .textstats import token_count

PPM = 1_000_000


def mixture_plan(
    documents: DataFrame,
    weights: dict[str, float],
    target_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Per-source sampling plan for a target mixture.

    ``weights`` are relative (normalized internally); each listed
    source gets ``tokens_target = floor(weight / sum(weights) *
    target_tokens)`` and the plan expresses how to hit it from the
    ``tokens_avail`` actually present: repeat the whole source
    ``n_epochs`` times, then keep a deterministic ``residual_ppm``
    fraction of one more pass. Sources absent from ``weights`` are
    excluded (rate 0). Pass ``n_tokens`` to plan with a real
    tokenizer's counts instead of whitespace tokens."""
    if n_tokens is None:
        n_tokens = token_count(F.coalesce(F.col(text_col), F.lit("")))
    wsum = float(sum(weights.values()))
    spark = documents.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        f"{source_col} string, weight double",
    )
    inv = documents.groupBy(source_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_tokens.cast("long")).cast("bigint").alias("tokens_avail"),
    )
    tgt = F.floor(F.col("weight") * target_tokens / wsum).cast("bigint")
    plan = (
        inv.join(F.broadcast(wdf), source_col)
        .withColumn("tokens_target", tgt)
        .withColumn(
            # a weighted source whose docs are all empty (tokens_avail
            # 0) plans zero copies instead of tripping ANSI
            # divide-by-zero mid-job
            "n_epochs",
            F.when(
                F.col("tokens_avail") > 0,
                F.floor(F.col("tokens_target") / F.col("tokens_avail")),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        .withColumn(
            # divide BEFORE multiplying, in double: the naive
            # (rem * PPM) wraps BIGINT once tokens_avail ≳ 9.2e12
            # (plausible at 100-TB corpora). rem/avail ∈ [0,1) so the
            # double path is exact to ~1e-10 ppm; the oracle SQL uses
            # the identical IEEE association order for parity.
            "residual_ppm",
            F.when(
                F.col("tokens_avail") > 0,
                F.floor(
                    (F.col("tokens_target") % F.col("tokens_avail"))
                    .cast("double")
                    / F.col("tokens_avail").cast("double")
                    * PPM
                ),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
    )
    return plan.select(
        source_col, "n_docs", "tokens_avail", "tokens_target",
        "n_epochs", "residual_ppm",
    )


def sample_u_ppm(doc_id: Column, seed: int = 0) -> Column:
    """The sampler's uniform draw: 60-bit md5 hash of the doc id →
    integer in [0, PPM). Content-derived, so identical on every
    engine, partitioning and cluster size."""
    return F.pmod(md5_64(doc_id.cast("string"), seed), F.lit(PPM))


def mixture_sample(
    documents: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Materialize a :func:`mixture_plan`: each document of a planned
    source appears ``n_epochs`` times plus once more iff its hash draw
    is below ``residual_ppm``; output carries ``epoch`` (1-based) so
    repeated copies stay distinguishable downstream (packing treats
    each copy as a new document). Inner join ⇒ unplanned sources drop.
    """
    u = sample_u_ppm(F.col("doc_id"), seed)
    joined = documents.join(
        F.broadcast(plan.select(source_col, "n_epochs", "residual_ppm")),
        source_col,
    )
    n_copies = (
        F.col("n_epochs")
        + F.when(u < F.col("residual_ppm"), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    # sequence(1, 0) in Spark DESCENDS ([1, 0]) instead of returning
    # empty — gate on n_copies >= 1 and let explode drop empty arrays
    epochs = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    out = joined.withColumn("epoch", F.explode(epochs))
    return out.select(
        *[c for c in documents.columns], F.col("epoch").cast("int")
    )
