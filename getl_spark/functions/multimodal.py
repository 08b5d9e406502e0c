"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs —
the lakehouse-native layout for multimodal training data. The *Spark*
side here is real and tested: schemas, Arrow-batched ``mapInPandas``
plumbing, partition sizing. The codec step is stubbed behind
``GETL_SPARK_FAKE_DECODE`` because no image/audio libraries exist in
this container: with the flag (default) a deterministic byte-level
"decode" runs; without it the operator raises ``NotImplementedError``
pointing at the PIL/ffmpeg integration seam.

Scale notes: media rows are large — keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition of
binaries fits executor memory, and never collect. ``mapInPandas``
streams Arrow record batches, so peak memory is one batch, not one
partition.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from getl_spark.common.scale import pin

FAKE_DECODE = os.environ.get("GETL_SPARK_FAKE_DECODE", "1") == "1"

MEDIA_META_SCHEMA = (
    "media_type string, mime string, width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "n_bytes bigint, sha256 string, byte_mean double, byte_histogram array<int>"
)


def to_media(
    df: DataFrame,
    content_col: str,
    media_type: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a binary/string column into the standard media layout:
    ``content binary, meta struct<...>``."""
    return df.withColumn("content", F.col(content_col).cast("binary")).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Real pipeline: decode → resize → embed. Here the decode seam is
    stubbed; the computed features (byte stats + sha256) are real and
    deterministic, so the full distributed path — schema, batching,
    shuffle-free map — is exercised end-to-end.
    """
    if not FAKE_DECODE:
        raise NotImplementedError(
            "Real media decode requires PIL/torchvision/ffmpeg; install and "
            "replace _decode_batch (seam: getl_spark/functions/multimodal.py)."
        )
    out_schema = f"{id_col} bigint, n_bytes bigint, sha256 string, byte_mean double"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            contents = pdf[content_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": contents.map(len).astype("int64"),
                    "sha256": contents.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "byte_mean": contents.map(
                        lambda b: round(float(np.frombuffer(bytes(b), dtype=np.uint8).mean()), 6)
                        if len(b)
                        else 0.0
                    ),
                }
            )

    from getl_spark.common.scale import parallelize

    return parallelize(df.select(id_col, content_col)).mapInPandas(
        decode_batches, out_schema
    )


def resize(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image resize over binary content: ``(id, content, meta)`` with
    ``meta.width/height`` set to the target. The real pipeline decodes
    → resamples → re-encodes per Arrow batch; here the codec seam is
    stubbed (no PIL in this container) with a deterministic byte-level
    resample — truncate-or-cycle the payload to ``width*height`` bytes
    — so the distributed shape (schema with a rebuilt meta struct,
    Arrow batching, shuffle-free map, output size ∝ target not input)
    is exercised end-to-end and downstream operators can build against
    it."""
    if not FAKE_DECODE:
        raise NotImplementedError(
            "Real resize requires PIL/torchvision; install and replace the "
            "resample step (seam: getl_spark/functions/multimodal.py)."
        )
    if width <= 0 or height <= 0:
        raise ValueError("resize: width and height must be positive")
    target = width * height
    out_schema = (
        f"{id_col} bigint, content binary, meta struct<{MEDIA_META_SCHEMA}>"
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fit(blob):
            if blob is None:
                return None  # null media stays null, never crashes the task
            b = bytes(blob)
            if not b:
                return bytes(target)
            reps = -(-target // len(b))
            return (b * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": pdf[content_col].map(fit),
                    "meta": [
                        {
                            "media_type": "image",
                            "mime": "application/octet-stream",
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                        }
                    ]
                    * len(pdf),
                }
            )

    from getl_spark.common.scale import parallelize

    return parallelize(df.select(id_col, content_col)).mapInPandas(
        resample, out_schema
    )


def frame_sample(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    num_frames: int = 4,
) -> DataFrame:
    """Deterministic "frame" sampling stub for video binaries: emits
    ``num_frames`` evenly-spaced byte slices per row. The row-explosion
    shape (one input row → N frame rows) matches a real ffmpeg
    frame sampler, so downstream operators can build against it."""
    if not FAKE_DECODE:
        raise NotImplementedError("Real frame sampling requires ffmpeg bindings.")
    out_schema = f"{id_col} bigint, frame_idx int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "frame_bytes": []}
            for _, row in pdf.iterrows():
                blob = bytes(row[content_col])
                step = max(len(blob) // num_frames, 1)
                for i in range(num_frames):
                    rows[id_col].append(row[id_col])
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(blob[i * step : i * step + step])
            yield pd.DataFrame(rows)

    from getl_spark.common.scale import parallelize

    return parallelize(df.select(id_col, content_col)).mapInPandas(
        sample, out_schema
    )


def phash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit perceptual hash per media row → ``(id, phash bigint)`` —
    the image-side analogue of ``text.fingerprint``: near-identical
    payloads land within a small hamming distance, so
    :func:`phash_pairs` finds re-encoded/cropped duplicates without a
    quadratic scan.

    The real pipeline is decode → grayscale → 32×32 DCT → low-frequency
    8×8 → median threshold. The codec step sits behind the same
    ``GETL_SPARK_FAKE_DECODE`` seam as the rest of this module: the
    deterministic stand-in treats the raw bytes as the decoded plane —
    64 equal byte-blocks, block means, bit i = (mean_i > median). Block
    means are *local* statistics, so a payload edit flips only the bits
    of the blocks it touches — exactly the locality a real pHash has —
    while the distributed shape (Arrow-batched map, no shuffle, bigint
    signatures ready for the banded join) is the production path.
    Empty/NULL payloads hash to 0.
    """
    if not FAKE_DECODE:
        raise NotImplementedError(
            "Real pHash requires an image decode + DCT (PIL/scipy); install "
            "and replace the block-mean stand-in (seam: "
            "getl_spark/functions/multimodal.py)."
        )
    out_schema = f"{id_col} bigint, phash bigint"

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(blob):
            if blob is None:
                return 0
            b = bytes(blob)
            if not b:
                return 0
            arr = np.frombuffer(b, dtype=np.uint8)
            if arr.size < 64:
                arr = np.resize(arr, 64)
            bounds = (np.arange(65, dtype=np.int64) * arr.size) // 64
            means = np.add.reduceat(arr.astype(np.float64), bounds[:-1]) / np.diff(
                bounds
            )
            med = np.median(means)
            bits = means > med  # strict: a constant payload hashes to 0
            h = 0
            for i, bit in enumerate(bits):
                if bit:
                    h |= 1 << (63 - i)
            return h - (1 << 64) if h >= (1 << 63) else h  # signed bigint

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": pdf[content_col].map(one)}
            )

    from getl_spark.common.scale import parallelize

    return parallelize(df.select(id_col, content_col)).mapInPandas(
        hash_batches, out_schema
    )


def phash_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Near-duplicate media pairs: ``phash`` then the shared banded
    hamming self-join (``dedup.hamming_pairs``) — ``(id_a, id_b,
    hamming)`` with distance ≤ ``max_hamming``, no quadratic scan.
    Default radius 8 (vs simhash's 3): perceptual hashes of re-encoded
    images drift more bits than text shingle fingerprints. At 100 TB
    set ``max_chunk_df`` exactly as documented on
    ``dedup.simhash_pairs`` — flat-color/black frames are the media
    equivalent of boilerplate text and flood a chunk bucket.
    """
    from getl_spark.functions.dedup import hamming_pairs

    sigs = phash(df, content_col, id_col).transform(pin)
    return hamming_pairs(
        sigs,
        id_col=id_col,
        sig_col="phash",
        max_hamming=max_hamming,
        bands=bands,
        max_chunk_df=max_chunk_df,
    )


def dedup_media(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
    max_chunk_df: Optional[int] = None,
    quality_col: Optional[str] = None,
) -> DataFrame:
    """One-call media near-dedup: perceptual-hash candidate pairs →
    connected components → one survivor per near-duplicate cluster
    (min id, or the best row by ``quality_col`` — e.g. highest
    resolution / newest crawl). The media symmetric of
    ``dedup.near_dedup`` (text) and ``dedup.semantic_dedup``
    (embeddings): the same pairs→clusters→survivor collapse, with
    ``phash_pairs`` as the candidate generator — re-encoded,
    resized, and slightly-cropped copies of one image land within
    ``max_hamming`` bits of each other while distinct images do not.
    YAML-callable inside ``transform::generic``.

    Scale shape: everything rides audited components — one Arrow
    ``mapInPandas`` hash pass (decode stubbed honestly in this
    container; the plumbing is real), the banded hamming equi-self-
    join (``max_chunk_df`` caps flat-color/black-frame hot buckets,
    exactly the simhash discipline), components via
    large-star/small-star (driver union-find below the threshold),
    and one anti-join of the corpus against the losers. No step is
    quadratic in the corpus.
    """
    pairs = phash_pairs(
        df,
        content_col=content_col,
        id_col=id_col,
        max_hamming=max_hamming,
        bands=bands,
        max_chunk_df=max_chunk_df,
    )
    from getl_spark.functions.graph import dedup_by_component

    return dedup_by_component(
        df, pairs, id_col=id_col, quality_col=quality_col
    )
