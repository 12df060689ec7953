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

Hash functions are xxhash64 with fixed seeds — deterministic across
partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import shingles


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
    documents: DataFrame, text_col: str = "text", k: int = 32, shingle_k: int = 3
) -> DataFrame:
    """doc_id → array of K minhash values (native: per-seed min over
    xxhash64(shingle, seed-salted))."""
    sh = shingles(F.col(text_col), shingle_k).alias("sh")

    def hasher(seed: int):
        # NB: must be a one-arg lambda — a second lambda parameter would
        # be bound to the element index by the HOF machinery
        return lambda s: F.xxhash64(s, F.lit(seed))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), hasher(i)))
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
) -> DataFrame:
    """Near-duplicate pairs via banded LSH + signature-similarity check.

    Returns (doc_a, doc_b, sig_similarity) with doc_a < doc_b and
    estimated Jaccard (= fraction of matching minhashes) ≥ threshold.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(documents, text_col, k, shingle_k)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ":",
                        *[
                            F.col("signature")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        "doc_id", "signature", F.explode(band_structs).alias("bb")
    ).select("doc_id", "signature", F.col("bb.band"), F.col("bb.bucket"))

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


def simhash(col: Column, bits: int = 64) -> Column:
    """64-bit SimHash over shingle hashes, as a signed long.

    Bit i of the signature = majority vote of bit i across shingle
    xxhash64 values — expressed with native bit ops + aggregate."""
    sh = shingles(col)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
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


def simhash_near_dups(
    documents: DataFrame, text_col: str = "text", prefix_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on rotated prefixes (any pair
    within Hamming distance ≤ max_hamming shares at least one of the 4
    rotated 16-bit prefixes — pigeonhole over 4 blocks), then verify
    exact Hamming distance natively via bit_count(xor)."""
    d = documents.select(
        "doc_id", simhash(F.col(text_col)).alias("sig")
    )
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


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Scale shape mirrors minhash-LSH: random-hyperplane signatures
    bucket the vectors (near-identical embeddings share sign bits with
    high probability), candidate pairs come from bucket equi-joins on
    the signature and all its 1-bit flips, and the exact cosine runs
    only inside candidate sets — never the O(n²) cross join.
    Returns (vec_a, vec_b, cosine) with vec_a < vec_b, cosine ≥
    threshold, rounded to 4 decimals.
    """
    from .similarity import cosine, hyperplanes, lsh_signature

    dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    planes = hyperplanes(dim, n_planes)
    sigs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    )
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
