"""Similarity search over embedding columns (array<float>).

Two paths:

- :func:`cosine_topk` — exact brute force: broadcast the query vector,
  one narrow pass, global top-k via window. The baseline and the
  verifier for the approximate path.
- :func:`lsh_bucket_topk` — random-hyperplane LSH: vectors are bucketed
  by a P-bit sign signature against deterministic pseudo-random
  hyperplanes; the query probes its own bucket plus all 1-bit-flip
  buckets (multi-probe), then ranks candidates exactly. At cluster
  scale the bucket join replaces the full scan: candidates ≈ n / 2^P
  per probe instead of n.

All dot products run as native zip_with/aggregate over doubles — no
UDF, no Python in the scoring loop. Hyperplanes are seeded-hash
deterministic: identical across partitioning and cluster size.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of one stored vector (excluding itself)."""
    qv = embeddings.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    scored = (
        embeddings.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col).alias("vec_id"),
            cosine(F.col(vec_col), F.col("qvec")).alias("score"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "vec_id", F.round("score", 4).alias("score"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 0x5EED) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes."""
    rng = random.Random(seed)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against the plane set → int."""
    bits = [
        F.when(
            _dot(
                vec.cast("array<double>"),
                F.array(*[F.lit(w) for w in plane]),
            )
            >= 0,
            F.lit(1 << p),
        ).otherwise(F.lit(0))
        for p, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: signature buckets + 1-bit multi-probe, exact
    rerank inside the candidate set."""
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    planes = hyperplanes(dim, n_planes)

    sigs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    )
    q = sigs.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec"), F.col("sig").alias("qsig")
    )
    # probe set: own bucket + every 1-bit flip
    probes = F.array_union(
        F.array(F.col("qsig")),
        F.array(*[
            F.col("qsig").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]),
    )
    probe_df = q.select("qvec", F.explode(probes).alias("sig"))

    cand = sigs.where(F.col("vec_id") != query_vec_id).join(
        F.broadcast(probe_df), "sig"
    )
    scored = cand.select(
        "vec_id", cosine(F.col("vec"), F.col("qvec")).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "vec_id", F.round("score", 4).alias("score"))
    )
