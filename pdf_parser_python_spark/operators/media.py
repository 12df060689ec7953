"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, batch shape, partition sizing, UDF
signatures — is real and tested; the actual codec work is stubbed
behind :data:`HAVE_CODECS` because image/audio libraries are not in
this container (the reference's equivalent stage is PyMuPDF xref
extraction, /root/reference/parser/block_extractor.py:234-357, which
is likewise unavailable here).

Design notes for 100 TB:
- binary payloads ride in their own column so Parquet page pruning
  keeps metadata-only scans cheap (never select `payload` unless the
  stage needs bytes);
- decode/feature stages are ``mapInPandas`` so one Arrow batch
  amortizes per-batch model/codec setup;
- `media_ref` joins back to extraction output spans — media stays
  normalized, never inlined into span rows.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_CODECS = True
except Exception:  # pragma: no cover
    HAVE_CODECS = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("entropy_proxy", T.DoubleType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                f"img://syn/{i}",
                ["image", "audio", "video"][i % 3],
                bytearray(payload),
                64 + i % 512,
                48 + i % 256,
                None if i % 3 == 0 else 1000 + i,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def size_filter(media: DataFrame, min_w: int = 50, min_h: int = 50) -> DataFrame:
    """F4: drop tiny images (reference block_extractor.py:289-293);
    non-image rows pass through."""
    return media.where(
        (F.col("media_type") != "image")
        | ((F.col("width") >= min_w) & (F.col("height") >= min_h))
    )


def dedup_by_content(media: DataFrame) -> DataFrame:
    """S10: content-hash dedup before any expensive decode
    (reference block_extractor.py:308-343)."""
    return media.withColumn("content_hash", F.sha2("payload", 256)).dropDuplicates(
        ["content_hash"]
    )


def _fake_features(b: bytes, feature_dim: int) -> list[float]:
    """Deterministic payload-hash featurization (the no-codec path)."""
    return [
        float(zlib.crc32(b, d + 1) % 10_000) / 10_000.0
        for d in range(feature_dim)
    ]


def _md5_features(b: bytes, feature_dim: int) -> list[float]:
    """md5-derived featurization, bit-equal to the DuckDB oracle's
    ``('0x' || substr(md5(d || ':' || lower(hex(payload))), 1, 15))::BIGINT``
    (same construction as functions/hashing.md5_64, seed = grid index)."""
    hx = b.hex()
    return [
        float(
            int(hashlib.md5(f"{d}:{hx}".encode()).hexdigest()[:15], 16)
            % 10_000
        )
        / 10_000.0
        for d in range(feature_dim)
    ]


def _shannon_entropy(b: bytes) -> float:
    """Byte-histogram Shannon entropy, normalized to [0, 1] (bits per
    byte / 8). Replaces the round-1 zlib-ratio proxy: same monotone
    signal, but exactly re-expressible in the DuckDB oracle."""
    import math

    n = len(b)
    if not n:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    return -sum(
        (c / n) * math.log2(c / n) for c in counts.values()
    ) / 8.0


def _pil_features(b: bytes, feature_dim: int) -> list[float] | None:
    """Real decode path: grayscale-downsample the image and emit mean
    pixel intensity per grid cell. Returns None when the payload is not
    decodable (caller falls back to the hash features so the stage
    never throws — north rule: per-row failures must not fail the job).
    """
    import io

    try:  # pragma: no cover - PIL absent in this container
        side = max(1, int(feature_dim ** 0.5))
        img = PIL.Image.open(io.BytesIO(b)).convert("L")
        img = img.resize((side, side))
        px = list(img.getdata())
        feats = [float(p) / 255.0 for p in px]
        # pad/trim the grid to exactly feature_dim
        feats = (feats + [0.0] * feature_dim)[:feature_dim]
        return feats
    except Exception:
        return None


def extract_features(
    media: DataFrame,
    feature_dim: int = 16,
    feature_hasher: str = "crc32",
    digest_over: str = "bytes",
    decode: bool = True,
) -> DataFrame:
    """Decode + featurize via mapInPandas.

    With codecs present (HAVE_CODECS) images are decoded with PIL into
    a grayscale intensity grid of ``feature_dim`` floats; payloads that
    fail to decode — and all rows when codec libs are absent, as in
    this container — get a deterministic payload-hash featurization.
    The batch shape, schema, and partitioning are the production ones.

    Pluggable knobs (same pattern as the dedup family's ``hasher``):

    - ``feature_hasher``: ``"crc32"`` (production default, fastest) or
      ``"md5"`` (bit-reproducible in DuckDB — used by the
      driver-contract query so this stage gets hash-checked);
    - ``digest_over``: ``"bytes"`` (sha256 of the raw payload,
      production default) or ``"hex"`` (sha256 of the lowercase hex
      encoding — DuckDB 1.0's sha256() only accepts VARCHAR, so the
      oracle-checked variant digests the hex form);
    - ``decode``: set False to skip the PIL decode attempt entirely so
      the output is environment-independent (the oracle-checked query
      does this — a PIL-decoded grid has no SQL re-expression).

    ``entropy_proxy`` is byte-histogram Shannon entropy normalized to
    [0, 1] — deterministic and SQL-expressible, unlike a compression
    ratio.
    """
    fallback = _md5_features if feature_hasher == "md5" else _fake_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload or b"")
                digest_src = b.hex().encode() if digest_over == "hex" else b
                sha = hashlib.sha256(digest_src).hexdigest()
                feats = (
                    _pil_features(b, feature_dim)
                    if (decode and HAVE_CODECS)
                    else None
                )
                if feats is None:
                    feats = fallback(b, feature_dim)
                out.append((ref, sha, len(b), _shannon_entropy(b), feats))
            yield pd.DataFrame(
                out, columns=["media_ref", "sha256", "n_bytes",
                              "entropy_proxy", "features"]
            )

    return media.select("media_ref", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
