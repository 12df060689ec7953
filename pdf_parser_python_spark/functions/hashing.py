"""Pluggable 64-bit hashing for dedup/ANN operators.

Two families:

- :func:`xx64` — xxhash64, the production default (single JVM
  intrinsic, fastest at 100 TB);
- :func:`md5_64` — md5-derived 60-bit value reproducible in DuckDB 1.0
  (``('0x' || substr(md5(seed || ':' || x), 1, 15))::BIGINT``), used by
  the driver-contract queries so the dedup/ANN family gets hash-checked
  against a SQL oracle instead of rows-only. 15 hex digits = 60 bits,
  safely inside a signed int64 in both engines.

Seeding is uniform: the seed is prefixed as ``"{seed}:"`` text so the
same construction works for seeded minhash permutations and unseeded
fingerprints (seed 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xx64(col: Column, seed: int = 0) -> Column:
    return F.xxhash64(col, F.lit(seed))


def md5_64(col: Column, seed: int = 0) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def md5_64_sql(expr: str, seed: int | str = 0) -> str:
    """The DuckDB twin of :func:`md5_64`. ``seed`` may be an int or a
    SQL expression string (e.g. a lambda variable)."""
    seed_expr = f"'{seed}:'" if isinstance(seed, int) else f"({seed} || ':')"
    return f"('0x' || substr(md5({seed_expr} || ({expr})), 1, 15))::BIGINT"


# ── multi-value combiners ────────────────────────────────────────────────
# Hash a TUPLE of already-hashed 64-bit lanes (token hashes, signature
# rows) into one value. The xx64 combiner stays entirely on fixed-width
# long lanes — Spark's XxHash64 expression takes any number of child
# columns and folds them without materializing a string, which is what
# makes hash-shingling memory-bandwidth-cheap. The md5 combiner joins
# the decimal renderings with ':' (concat_ws SKIPS nulls, matching
# xxhash64's skip-null fold) so the DuckDB oracle can reproduce it with
# ``array_to_string``/'||'. Both agree with their single-value
# counterparts' seeding convention ("{seed}:" prefix / trailing seed
# lane).


def xx64_combine(cols: list[Column], seed: int = 0) -> Column:
    return F.xxhash64(*cols, F.lit(seed))


def md5_64_combine(cols: list[Column], seed: int = 0) -> Column:
    return md5_64(F.concat_ws(":", *[c.cast("string") for c in cols]), seed)


def combiner_for(hasher):
    """Resolve the multi-lane combiner matching a scalar ``hasher``.
    Unknown hashers fall back to the string-join construction (correct
    for any hasher, just not string-free)."""
    if hasher is xx64:
        return xx64_combine
    if hasher is md5_64:
        return md5_64_combine

    def generic(cols: list[Column], seed: int = 0) -> Column:
        return hasher(
            F.concat_ws(":", *[c.cast("string") for c in cols]), seed
        )

    return generic
