"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark set.

The standard LLM-corpus hygiene pass (GPT-3 appendix C, PaLM §7,
Dolma): an n-gram (default n=8, the GPT-3 choice) from a benchmark
prompt appearing verbatim in a training document marks that document
contaminated. Reference scope: no counterpart in the reference engine
(per-PDF pipeline); this extends the training-data family the 100-TB
deployment needs.

Scale shape — built for an asymmetric join:

- the BENCHMARK side is small (eval suites are ~10³-10⁷ grams): its
  distinct gram hashes are explicitly ``F.broadcast`` — the corpus
  side never shuffles for the match;
- the CORPUS side is map-only up to the match (tokenize → n-grams →
  per-doc dedup → explode), then ONE aggregation exchange keyed by
  doc_id — and only over rows that actually matched, a tiny fraction
  of the corpus;
- the clean-set variant is a broadcast LEFT ANTI join: zero shuffle
  of the corpus at all.

Hashes are pluggable like the dedup family: ``xx64`` in production,
``md5_64`` in the driver-contract queries so a DuckDB oracle can
reproduce every value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import xx64
from .repetition import word_ngrams

DEFAULT_N = 8


def _gram_hashes(col: Column, n: int, hasher) -> Column:
    """Distinct hashed word n-grams of ``col`` (set semantics — one
    doc matching one benchmark gram k times counts once)."""
    return F.transform(
        F.array_distinct(word_ngrams(col, n)), lambda g: hasher(g, 0)
    )


def benchmark_grams(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = DEFAULT_N,
    hasher=xx64,
) -> DataFrame:
    """Distinct ``(gram_hash, gram)`` rows over the benchmark set —
    the small side of the contamination join."""
    return (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias(
                "gram"
            )
        )
        .select(hasher(F.col("gram"), 0).alias("gram_hash"), "gram")
        # min() not dropDuplicates: on a (vanishingly unlikely) hash
        # collision the surviving gram is still deterministic, so the
        # report is reproducible across partitionings and in the oracle.
        .groupBy("gram_hash")
        .agg(F.min("gram").alias("gram"))
    )


def contamination_report(
    documents: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
    hasher=xx64,
) -> DataFrame:
    """Contaminated documents only: ``(doc_id, n_matched_grams,
    sample_gram)`` where ``sample_gram`` is the lexicographically
    smallest matching benchmark gram (deterministic evidence row).

    One broadcast hash join + one aggregation over matched rows; the
    corpus itself is never shuffled."""
    bg = F.broadcast(benchmark_grams(benchmark, bench_text_col, n, hasher))
    doc_grams = documents.select(
        "doc_id",
        F.explode(_gram_hashes(F.col(text_col), n, hasher)).alias("gram_hash"),
    )
    return (
        doc_grams.join(bg, "gram_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched_grams"),
            F.min("gram").alias("sample_gram"),
        )
    )


def decontaminated(
    documents: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
    hasher=xx64,
) -> DataFrame:
    """The clean corpus: documents sharing NO n-gram with the
    benchmark. Both joins broadcast (benchmark grams, then the matched
    doc_id set — contaminated ids are a tiny fraction of the corpus),
    so the corpus itself is never shuffled; output schema = input
    schema."""
    bg = F.broadcast(
        benchmark_grams(benchmark, bench_text_col, n, hasher).select(
            "gram_hash"
        )
    )
    contaminated_ids = (
        documents.select(
            "doc_id",
            F.explode(_gram_hashes(F.col(text_col), n, hasher)).alias(
                "gram_hash"
            ),
        )
        .join(bg, "gram_hash")
        .select("doc_id")
        .distinct()
    )
    return documents.join(F.broadcast(contaminated_ids), "doc_id", "left_anti")
