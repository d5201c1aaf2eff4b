"""Multimodal (image/audio/video) column handling.

Design for 100 TB: media is carried as opaque ``binary`` columns with a
typed metadata struct; all per-item compute is Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.
Real decoders (PIL/ffmpeg/torchaudio) are NOT available in this
container — the decode step is stubbed behind a clearly-marked switch
(deterministic fake or ``NotImplementedError``), while every piece of
Spark-side plumbing (schema, batching, partition sizing, UDF
signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 64


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a feature vector
    derived from the payload's sha256 — stable across runs/engines.
    Replace with PIL/ffmpeg decode when those libs exist."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(dim)


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = FEATURE_DIM,
    real_decoder=None,
) -> DataFrame:
    """payload → feature vector, Arrow-batched.

    ``real_decoder(bytes) -> np.ndarray`` plugs in an actual model;
    without one the deterministic fake is used (STUB — the container
    has no image/audio libraries).
    """
    decoder = real_decoder or _fake_decode

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("feature", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, dim).tolist() if p is not None else None for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def byte_histogram(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Real (non-stub) content feature: normalized 256-bin byte
    histogram per payload — deterministic, library-free, useful for
    dedup/clustering of opaque blobs."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("histogram", ArrayType(DoubleType())),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists, sizes = [], []
            for p in pdf[payload_col]:
                if p is None:
                    hists.append(None)
                    sizes.append(0)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                h = np.bincount(arr, minlength=256).astype(float)
                total = h.sum()
                hists.append((h / total if total else h).tolist())
                sizes.append(len(p))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "histogram": hists, "n_bytes": sizes}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_bytes: int = 1024,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling for video payloads: treat the payload as a
    sequence of fixed-size frames and keep every Nth (STUB framing —
    a real implementation would parse container headers; the
    explode/partitioning shape is the real part).

    Returns (media_id, frame_idx, frame payload).
    """
    n_frames = F.floor(F.length(payload_col) / frame_bytes).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)))
    return (
        df.filter(F.col("media_type") == "video")
        .select(id_col, payload_col, idx.alias("frame_idx"))
        .select(
            id_col,
            "frame_idx",
            F.expr(
                f"substring({payload_col}, frame_idx * {frame_bytes} + 1, {frame_bytes})"
            ).alias("frame"),
        )
    )


def resize_stub(*_args, **_kwargs):
    """Image resize requires a decoder; not available in this
    container."""
    raise NotImplementedError(
        "image resize needs PIL/opencv which are not installed; "
        "wire a real_decoder into decode_features instead"
    )
