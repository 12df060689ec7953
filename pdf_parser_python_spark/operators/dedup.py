"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-aware:

- exact: hash-groupBy on a content digest (one shuffle on the digest);
- minhash + LSH: shingle → K minhashes → B bands → band-bucket
  self-join → candidate pairs above Jaccard threshold. The band-bucket
  join is the scale trick: candidates come from equi-joins on small
  bucket keys instead of an O(n²) cross join;
- simhash: 64-bit near-dup signature (Hamming-ball grouping via
  rotated prefix buckets);
- n-gram Jaccard: exact verification of candidate pairs;
- embedding-cosine: hyperplane-bucketed near-dup pairs over an
  embedding column, exact cosine only inside candidate sets.

Hash functions are pluggable (functions/hashing.py): xxhash64 with
fixed seeds is the production default; the md5-derived variant is
reproducible in DuckDB so the driver contract can hash-check these
operators against a SQL oracle. Both are deterministic across
partitioning and cluster size.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import xx64
from .textstats import shingles

Hasher = Callable[[Column, int], Column]


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Digest-grouped duplicate clusters; keeper = min doc_id."""
    d = documents.select("doc_id", F.sha2(F.col(text_col), 256).alias("digest"))
    return (
        d.groupBy("digest")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.array_sort(F.collect_list("doc_id")).alias("members"),
        )
    )


def minhash_signatures(
    documents: DataFrame, text_col: str = "text", k: int = 32,
    shingle_k: int = 3, hasher: Hasher = xx64,
) -> DataFrame:
    """doc_id → array of K minhash values (native: per-seed min over
    hasher(shingle, seed))."""
    sh = shingles(F.col(text_col), shingle_k).alias("sh")

    def perm(seed: int):
        # NB: must be a one-arg lambda — a second lambda parameter would
        # be bound to the element index by the HOF machinery
        return lambda s: hasher(s, seed)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), perm(i)))
            for i in range(k)
        ]
    )
    return documents.select("doc_id", sh).select(
        "doc_id", sig.alias("signature")
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_k: int = 3,
    hasher: Hasher = xx64,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH + signature-similarity check.

    Returns (doc_a, doc_b, sig_similarity) with doc_a < doc_b and
    estimated Jaccard (= fraction of matching minhashes) ≥ threshold.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(documents, text_col, k, shingle_k, hasher)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hasher(
                    F.concat_ws(
                        ":",
                        *[
                            F.col("signature")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    ),
                    0,
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        "doc_id", "signature", F.explode(band_structs).alias("bb")
    ).select("doc_id", "signature", F.col("bb.band"), F.col("bb.bucket"))

    if max_bucket is not None:
        # skew guard: a mega-cluster of identical docs puts m docs in
        # one band bucket → O(m²) pairs inside the self-join. Buckets
        # beyond the cap are dropped (mass-duplicates belong to
        # exact_dedup, which runs in one linear shuffle).
        from pyspark.sql.window import Window

        bn = F.count("*").over(Window.partitionBy("band", "bucket"))
        buckets = buckets.withColumn("_bn", bn).where(
            F.col("_bn") <= max_bucket
        ).drop("_bn")

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sim = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(k)
    )
    return (
        cand.withColumn("sig_similarity", F.round(sim, 4))
        .where(F.col("sig_similarity") >= threshold)
        .select("doc_a", "doc_b", "sig_similarity")
    )


def simhash(col: Column, bits: int = 64, hasher: Hasher = xx64) -> Column:
    """64-bit SimHash over shingle hashes, as a signed long.

    Bit i of the signature = majority vote of bit i across shingle
    hashes — expressed with native bit ops + aggregate."""
    sh = shingles(col)
    hashes = F.transform(sh, lambda s: hasher(s, 0))
    n = F.size(hashes)

    def bit_set(i: int):
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    bit_cols = []
    for i in range(bits):
        ones = F.size(F.filter(hashes, bit_set(i)))
        bit_cols.append(
            F.when(ones * 2 >= n, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63)))
            .otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def simhash_blocks(max_hamming: int) -> int:
    """Smallest power-of-two block count with a pigeonhole recall
    guarantee: a pair within Hamming distance h differs in ≤ h blocks,
    so with blocks ≥ h+1 at least one block (prefix) matches exactly.
    Round 1 accepted any max_hamming with 4 fixed blocks, silently
    voiding the guarantee for h > 3."""
    for b in (2, 4, 8, 16, 32, 64):
        if b >= max_hamming + 1:
            return b
    return 64


def simhash_near_dups(
    documents: DataFrame, text_col: str = "text", prefix_bits: int | None = None,
    max_hamming: int = 3, hasher: Hasher = xx64,
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on rotated prefixes (any pair
    within Hamming distance ≤ max_hamming shares at least one of the
    rotated prefixes — pigeonhole over ≥ max_hamming+1 blocks, derived
    by :func:`simhash_blocks` unless ``prefix_bits`` is forced), then
    verify exact Hamming distance natively via bit_count(xor)."""
    d = documents.select(
        "doc_id", simhash(F.col(text_col), hasher=hasher).alias("sig")
    )
    if prefix_bits is None:
        prefix_bits = 64 // simhash_blocks(max_hamming)
    blocks = 64 // prefix_bits
    rot = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("block"),
                    F.shiftrightunsigned(
                        F.col("sig"), i * prefix_bits
                    ).bitwiseAND(F.lit((1 << prefix_bits) - 1)).alias("prefix"),
                )
                for i in range(blocks)
            ]
        )
    )
    keyed = d.select("doc_id", "sig", rot.alias("r")).select(
        "doc_id", "sig", "r.block", "r.prefix"
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.prefix") == F.col("b.prefix"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.sig").bitwiseXOR(F.col("b.sig"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def ngram_jaccard(
    documents: DataFrame, pairs: DataFrame, text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard verification of candidate (doc_a, doc_b) pairs —
    two broadcast-friendly joins + array_intersect/union."""
    sh = documents.select(
        "doc_id", shingles(F.col(text_col), shingle_k).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a")
                     .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "doc_a",
        "doc_b",
        F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )


def lsh_planes_for(n_rows: int) -> int:
    """Corpus-scaled plane count: round 1's fixed 8 planes = 256
    buckets total, which degenerates to quadratic bucket self-joins at
    real corpus sizes (10⁹ vectors → ~4M per bucket). Scale so the
    average bucket holds ~2⁸ vectors, floor 8, cap 30 (signatures stay
    inside int64 and 1-bit multi-probe stays cheap)."""
    import math

    return min(30, max(8, math.ceil(math.log2(max(n_rows, 2))) - 8))


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Scale shape mirrors minhash-LSH: random-hyperplane signatures
    bucket the vectors (near-identical embeddings share sign bits with
    high probability), candidate pairs come from bucket equi-joins on
    the signature and all its 1-bit flips, and the exact cosine runs
    only inside candidate sets — never the O(n²) cross join.
    ``n_planes`` defaults to a corpus-scaled count (:func:`lsh_planes_for`);
    signature buckets larger than ``max_bucket`` are dropped (exact
    mass-duplicates belong to exact_dedup).
    Returns (vec_a, vec_b, cosine) with vec_a < vec_b, cosine ≥
    threshold, rounded to 4 decimals.
    """
    from .similarity import cosine, hyperplanes, lsh_signature

    dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    if n_planes is None:
        n_planes = lsh_planes_for(embeddings.count())
    planes = hyperplanes(dim, n_planes)
    sigs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        sigs = sigs.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("sig"))
        ).where(F.col("_bn") <= max_bucket).drop("_bn")
    # each vector lands in its own bucket + every 1-bit flip, so any
    # pair within Hamming distance 1 of signatures meets in ≥1 bucket
    probes = F.array_union(
        F.array(F.col("sig")),
        F.array(*[F.col("sig").bitwiseXOR(F.lit(1 << p))
                  for p in range(n_planes)]),
    )
    exploded = sigs.select(
        "vid", "vec", F.explode(probes).alias("bucket")
    )
    a, b = exploded.alias("a"), sigs.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.sig"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
