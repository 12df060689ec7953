"""Sequence packing: assign documents to fixed-token-budget training
packs (the tokenize-and-pack stage between curation and training).

Every document is placed at its exact offset in the corpus-wide token
stream (deterministic global order = ``doc_id`` ascending) and assigned
to the pack containing its FIRST token: ``pack_id = floor(start /
seq_len)`` — the GPT-style contiguous-stream packing where documents
may straddle pack boundaries (the trainer masks attention across the
boundary; the assignment here is by start offset so it is exact,
deterministic, and reproducible at any cluster size).

Scale shape — the naive formulation is ``sum(n_tokens) OVER (ORDER BY
doc_id)``, and Spark executes an un-partitioned ordered window ON A
SINGLE PARTITION: the whole corpus funnels through one task. This
operator instead runs the same two-phase prefix sum the extraction
engine's chunked native FSM uses (``operators/native.py``):

1. bucket by ``floor(doc_id / bucket_width)`` → per-bucket running
   sum (window partitioned by bucket — parallel);
2. per-bucket totals (one tiny aggregate, rows = #buckets) → running
   bucket offsets, broadcast back.

Exact same prefix sums, no single-task stage. Reference scope: no
counterpart in the reference engine; extends the training-data family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import token_count


#: u-space bucket shift for shuffled packing: md5-derived order keys
#: are 60-bit, so dropping the low 44 bits yields ≤2^16 hash-uniform
#: buckets — the per-bucket totals stay driver-scale by construction.
_SHUFFLE_BUCKET_SHIFT = 44


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    n_tokens: Column | None = None,
    bucket_width: int = 65536,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Per-doc pack assignment: ``doc_id, n_tokens, start, pack_id,
    pack_offset``. ``documents.doc_id`` must be numeric (it is the
    deterministic global order) and UNIQUE — ties in the window order
    would make ``start`` partition-order dependent. When the input
    carries an ``epoch`` column (mixture_sample's upsampled copies),
    it is used as the tiebreaker so ``(doc_id, epoch)`` ordering keeps
    the assignment deterministic without re-keying; otherwise re-key
    duplicated ids first (bench's e2e phase uses ``doc_id*K + epoch``).
    Pass ``n_tokens`` to use a real tokenizer's counts instead of
    whitespace tokens.

    ``shuffle_seed`` switches the global order from ``doc_id``
    ascending to a seeded pseudo-random permutation — the order key
    becomes the 60-bit md5 hash of the full order identity (``doc_id``
    alone, or ``doc_id:epoch`` when an epoch column is present, so
    upsampled copies land at independent stream positions; ``(doc_id,
    epoch)`` tiebreak), so adjacent documents in the token stream are
    decorrelated from crawl/source order, the standard requirement for
    GPT-style training packs. Same two-phase prefix sum, with hash-uniform u-space
    buckets replacing id-range buckets; still deterministic at any
    partitioning and cluster size, and reproducible per seed."""
    from ..functions.hashing import md5_64

    if n_tokens is None:
        n_tokens = token_count(
            F.coalesce(F.col(text_col), F.lit(""))
        ).cast("long")
    order_cols = ["doc_id"] + (
        ["epoch"] if "epoch" in documents.columns else []
    )
    if shuffle_seed is None:
        sort_cols = list(order_cols)
        bucket = F.floor(F.col("doc_id") / bucket_width)
        extra: list = []
    else:
        # hash the FULL order identity: when the input carries an
        # epoch column (mixture_sample's upsampled copies), each copy
        # must land at an independent stream position — hashing
        # doc_id alone would give all epochs of a doc one _u and pack
        # the duplicates back-to-back, defeating the decorrelation
        # the seed exists for
        key = (
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.col("epoch").cast("string"))
            if "epoch" in documents.columns
            else F.col("doc_id").cast("string")
        )
        u = md5_64(key, shuffle_seed)
        sort_cols = ["_u"] + order_cols
        bucket = F.shiftright(F.col("_u"), _SHUFFLE_BUCKET_SHIFT)
        extra = [u.alias("_u")]
    d = documents.select(
        *order_cols,
        *extra,
        n_tokens.alias("n_tokens"),
    ).withColumn("_b", bucket)
    in_bucket = Window.partitionBy("_b").orderBy(*sort_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = d.withColumn("_cum_in_b", F.sum("n_tokens").over(in_bucket))
    totals = d.groupBy("_b").agg(F.max("_cum_in_b").alias("_tot"))
    bucket_order = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the un-partitioned window here is over #buckets rows (corpus
    # size / bucket_width), not the corpus — driver-scale, by design
    offsets = totals.withColumn(
        "_off", F.sum("_tot").over(bucket_order) - F.col("_tot")
    ).select("_b", "_off")
    out = d.join(F.broadcast(offsets), "_b").select(
        *order_cols,
        "n_tokens",
        (F.col("_off") + F.col("_cum_in_b") - F.col("n_tokens")).alias(
            "start"
        ),
    )
    return out.select(
        *order_cols,
        "n_tokens",
        "start",
        F.floor(F.col("start") / seq_len).cast("bigint").alias("pack_id"),
        (F.col("start") % seq_len).cast("bigint").alias("pack_offset"),
    )


def pack_manifest(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Trainer-facing manifest of :func:`pack_sequences` output: for
    every pack, the ordered document SEGMENTS that fill it —
    ``doc_id:offset_in_pack:length`` — including carry-over from docs
    that straddle pack boundaries (where the trainer masks attention).

    Each doc explodes into the packs its token range intersects
    (``1 + n_tokens/seq_len`` rows — linear, a 10⁹-token giant emits
    ~500k segment rows, never a cross join), then one shuffle groups
    by pack. Every pack except the stream's last holds exactly
    ``seq_len`` manifest tokens by construction — asserted in tests,
    and the string encoding makes the result engine-hashable."""
    L = seq_len
    first = F.floor(F.col("start") / L)
    last = F.floor((F.col("start") + F.col("n_tokens") - 1) / L)
    e = packed.where(F.col("n_tokens") > 0).select(
        "doc_id", "start", "n_tokens",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    seg_start = F.greatest(F.col("start"), F.col("pack_id") * L)
    seg_end = F.least(
        F.col("start") + F.col("n_tokens"), (F.col("pack_id") + 1) * L
    )
    segs = e.select(
        "pack_id",
        "doc_id",
        (seg_start - F.col("pack_id") * L).cast("bigint").alias("off"),
        (seg_end - seg_start).cast("bigint").alias("len"),
    )
    return segs.groupBy("pack_id").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum("len").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("off", "doc_id", "len"))
                ),
                lambda s: F.concat_ws(
                    ":",
                    s["doc_id"].cast("string"),
                    s["off"].cast("string"),
                    s["len"].cast("string"),
                ),
            ),
            ",",
        ).alias("segments"),
    )


def pack_stats(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Per-pack rollup of :func:`pack_sequences` output: docs starting
    in the pack, their token sum, and the pack's start-fill fraction
    (tokens that BEGIN in this pack / seq_len — >1 means carry-over
    into later packs, the straddle case)."""
    return packed.groupBy("pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.sum("n_tokens") / seq_len, 4).alias("fill_ratio"),
    )
