"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, batch shape, partition sizing, UDF
signatures — is real and tested. Decode (r4): uncompressed 24/32-bit
BMP decodes with the dependency-free numpy decoder (:func:`decode_bmp`
— REAL pixels, exercised by non-skipped tests over
:func:`synthetic_bmp_media`); other formats route to PIL when present
(:data:`HAVE_CODECS` — no imaging library is installable in this
container, BENCH.md environment notes) and otherwise fall back to the
deterministic payload-hash featurization. The reference's equivalent
stage is PyMuPDF xref extraction
(/root/reference/parser/block_extractor.py:234-357).

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


def synthetic_bmp_media(spark, n: int = 32) -> DataFrame:
    """Deterministic VALID-BMP media table: real decodable payloads
    (seeded gradient + block patterns) so ``extract_features(
    decode=True)`` exercises the actual decode path in this container."""
    import numpy as np

    rows = []
    for i in range(n):
        w = 16 + (i * 7) % 48
        h = 12 + (i * 5) % 40
        yy, xx = np.mgrid[0:h, 0:w]
        px = ((xx * (17 + i) + yy * (29 + 3 * i)) % 256).astype(np.uint8)
        if i % 4 == 0:  # high-contrast half/half block
            px = np.zeros((h, w), dtype=np.uint8)
            px[:, w // 2:] = 255
        rows.append(
            (
                f"bmp://syn/{i}",
                "image",
                bytearray(encode_bmp(px)),
                w,
                h,
                None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synthetic_bmp_corpus(spark, n: int, partitions: int = 32) -> DataFrame:
    """Distributed twin of :func:`synthetic_bmp_media` for benchmark
    scale: payloads are encoded INSIDE mapInPandas workers (the driver
    never materializes a single image), so a 10⁵-payload corpus
    generates at full parallelism. Same deterministic gradient/block
    patterns, so every payload is a valid 24-bit BMP and
    ``extract_features(decode=True)`` exercises the real pixel path."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                w = 16 + (i * 7) % 48
                h = 12 + (i * 5) % 40
                yy, xx = np.mgrid[0:h, 0:w]
                px = ((xx * (17 + i) + yy * (29 + 3 * i)) % 256).astype(
                    np.uint8
                )
                if i % 4 == 0:
                    px = np.zeros((h, w), dtype=np.uint8)
                    px[:, w // 2:] = 255
                rows.append(
                    (f"bmp://syn/{i}", "image", encode_bmp(px), w, h, None)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "media_type", "payload",
                         "width", "height", "duration_ms"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


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
    signal, but exactly re-expressible in the DuckDB oracle.

    Vectorized (r5): the previous per-byte Python dict loop made THIS
    function — not decoding — the media stage's bottleneck (~5M
    interpreted iterations for a 5 MB image). np.bincount over a
    zero-copy frombuffer view + one vectorized p·log2(p) is the same
    histogram math at memory bandwidth; tests/test_media.py pins
    equality against the scalar reference loop."""
    import numpy as np

    n = len(b)
    if not n:
        return 0.0
    counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / n
    return float(-(p * np.log2(p)).sum() / 8.0)


def encode_bmp(pixels) -> bytes:
    """Serialize a (h, w) uint8 grayscale array as a standard 24-bit
    uncompressed BMP (BITMAPINFOHEADER, bottom-up, BGR, 4-byte row
    padding) — used by the synthetic corpus so the REAL decode path is
    exercisable without any imaging library."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = np.repeat(px[:, :, None], 3, axis=2)  # gray → B=G=R
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + data_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + body


def decode_bmp(b: bytes):
    """Dependency-free decoder for uncompressed 24/32-bit BMP → (h, w)
    float grayscale in [0, 1] (ITU-R 601 luma), or None if the payload
    is not such a BMP. The real decode path for this container, where
    no imaging library is installable (BENCH.md environment notes);
    other formats route to PIL when present, else the hash fallback."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    try:
        data_off = struct.unpack_from("<I", b, 10)[0]
        hdr_size = struct.unpack_from("<I", b, 14)[0]
        if hdr_size < 40:
            return None
        w, h = struct.unpack_from("<ii", b, 18)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        comp = struct.unpack_from("<I", b, 30)[0]
        if planes != 1 or bpp not in (24, 32) or comp != 0:
            return None
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h <= 0 or w * h > 64_000_000:
            return None
        nch = bpp // 8
        row_bytes = (w * nch + 3) & ~3
        if data_off + row_bytes * h > len(b):
            return None
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_bytes * h, offset=data_off
        ).reshape(h, row_bytes)
        if not top_down:
            rows = rows[::-1]
        px = rows[:, : w * nch].reshape(h, w, nch).astype(np.float64)
        # BGR(A) → luma
        gray = (
            0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
        )
        return gray / 255.0
    except Exception:
        return None


def _grid_features(gray, feature_dim: int) -> list[float]:
    """Mean intensity per cell of a side×side grid (row-major, padded/
    trimmed to feature_dim) — the same feature semantics as the PIL
    resize path."""
    import numpy as np

    side = max(1, int(feature_dim ** 0.5))
    h, w = gray.shape
    ys = (np.arange(side + 1) * h) // side
    xs = (np.arange(side + 1) * w) // side
    feats = []
    for r in range(side):
        y0, y1 = ys[r], max(ys[r + 1], ys[r] + 1)
        for c in range(side):
            x0, x1 = xs[c], max(xs[c + 1], xs[c] + 1)
            feats.append(float(gray[y0:y1, x0:x1].mean()))
    return (feats + [0.0] * feature_dim)[:feature_dim]


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
                feats = None
                if decode:
                    gray = decode_bmp(b)  # dependency-free real decode
                    if gray is not None:
                        feats = _grid_features(gray, feature_dim)
                    elif HAVE_CODECS:
                        feats = _pil_features(b, feature_dim)
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
