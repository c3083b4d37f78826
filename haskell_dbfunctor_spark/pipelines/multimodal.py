"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Design for the training-data pipeline at 100 TB: media rides as an
opaque ``binary`` column with a typed metadata struct; all decode /
feature-extract / resize / frame-sample steps run as Arrow-batched
pandas transforms over ``mapInPandas`` so bytes never round-trip
per-row through Python. The actual codec step is STUBBED (this
container ships no image/audio libs): ``decode_media`` uses a
deterministic fake decoder unless a real backend is importable, and
raises ``NotImplementedError`` when ``require_real=True``.

The Spark-side plumbing — schema, batch shape, partition sizing — is
real and tested; swapping the fake for Pillow/ffmpeg is a pure function
swap inside one pandas iterator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

try:  # pragma: no cover - not installed in this container
    import PIL.Image as _PIL  # noqa: N814
except ImportError:
    _PIL = None

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_len", T.LongType()),
    T.StructField("media_md5", T.StringType()),
    T.StructField("mean_byte", T.DoubleType()),
])


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically derive an opaque media blob + metadata from the
    documents table (stand-in for a real binary parquet column)."""
    # arithmetic (not hashed) so any SQL oracle reproduces it exactly
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.pmod(F.col("doc_id") * 37, F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id") * 101, F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.col("doc_id") * 17, F.lit(240)) + 1).cast("int").alias("n_frames"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        meta.alias("media_meta"),
    )


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a codec: digest + byte statistics."""
    return {
        "media_len": len(blob),
        "media_md5": hashlib.md5(blob).hexdigest(),
        "mean_byte": (sum(blob) / len(blob)) if blob else 0.0,
    }


def decode_media(media: DataFrame, *, require_real: bool = False) -> DataFrame:
    """Decode/feature-extract each blob, Arrow batch at a time.

    ``require_real=True`` demands an actual codec backend and raises
    ``NotImplementedError`` in this container (decode step is stubbed;
    plumbing is real).
    """
    if require_real and _PIL is None:
        raise NotImplementedError(
            "no media codec backend available in this environment; "
            "install Pillow/ffmpeg bindings and extend _decode_batches"
        )

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media"].map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_len": feats.map(lambda d: d["media_len"]).astype("int64"),
                "media_md5": feats.map(lambda d: d["media_md5"]),
                "mean_byte": feats.map(lambda d: d["mean_byte"]),
            })

    return media.mapInPandas(_decode_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
])


def resize_media(
    media: DataFrame, max_dim: int = 256, *, require_real: bool = False
) -> DataFrame:
    """Aspect-preserving resize plan: target dimensions are computed
    JVM-side from the metadata struct (no Python for the math); the
    pixel resample itself runs through the same Arrow mapInPandas
    plumbing as decode_media and is STUBBED in this container (the
    fake backend passes the blob through unchanged — a real backend
    replaces one pandas map). ``require_real=True`` raises here."""
    if require_real and _PIL is None:
        raise NotImplementedError(
            "no media codec backend available for resampling; install "
            "Pillow and swap the passthrough in _resize_batches"
        )
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_dim))
        / F.greatest(F.col("media_meta.width"), F.col("media_meta.height")),
    )
    sized = media.select(
        "doc_id",
        "media",
        F.greatest(
            F.lit(1), F.round(F.col("media_meta.width") * scale).cast("int")
        ).alias("out_width"),
        F.greatest(
            F.lit(1), F.round(F.col("media_meta.height") * scale).cast("int")
        ).alias("out_height"),
    )

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real backend: decode -> resample to (out_width, out_height)
            # -> re-encode. Fake backend: byte passthrough.
            yield pdf[["doc_id", "media", "out_width", "out_height"]]

    return sized.mapInPandas(_resize_batches, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Explode per-frame rows from the metadata (video frame sampling
    plan — the decode of each frame stays stubbed). Pure JVM-side."""
    return media.select(
        "doc_id",
        F.col("media_meta.n_frames").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0), F.col("media_meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_features(docs: DataFrame) -> DataFrame:
    """documents -> media blobs -> decoded feature table (rounded for
    oracle-stable hashing)."""
    out = decode_media(attach_fake_media(docs))
    return out.select(
        "doc_id", "media_len", "media_md5",
        F.round("mean_byte", 4).alias("mean_byte"),
    )
