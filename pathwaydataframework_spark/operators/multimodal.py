"""Multimodal (image/audio/video) column operators — north-star addendum.

Design: media are opaque ``binary`` columns + a typed metadata struct; all
transforms are Arrow-batched ``mapInPandas`` stages so each batch crosses
the Python boundary once and the plan stays partition-parallel (no driver
state, no collect).  The container lacks image/audio codecs, so the *decode*
kernels are deterministic stubs behind ``decoder=``: the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested, and a production
deployment swaps in Pillow/torchaudio kernels without touching the plan.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = "media_type string, width int, height int, duration_ms int"


def attach_media_meta(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """Derive the typed metadata struct from raw bytes (container sniffing).

    Stub sniffer: deterministic pseudo-metadata from the content hash —
    replace with real header parsing in production.  Pure column
    expressions, no Python.
    """
    h = F.xxhash64(F.col(binary_col))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(h, F.lit(3)) + 1).cast("int"),
            ).alias("media_type"),
            (F.pmod(h, F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(h, F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(h, F.lit(60000)) + 1).cast("int").alias("duration_ms"),
        ),
    )


def _default_image_decoder(data: bytes) -> list[float]:
    """STUB decode: deterministic 8-dim feature from content bytes.

    Production: ``PIL.Image.open(io.BytesIO(data))`` → resize → tensor.
    """
    digest = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    df: DataFrame,
    *,
    binary_col: str = "data",
    id_col: str = "media_id",
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """binary column → fixed-dim feature vector via Arrow-batched
    mapInPandas (one Python crossing per batch; partition-parallel)."""
    decoder = decoder or _default_image_decoder
    out_schema = f"{id_col} long, features array<double>"

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decoder(bytes(x)) if x is not None else [0.0] * feature_dim for x in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(_mapper, out_schema)


def frame_sample(
    df: DataFrame,
    *,
    binary_col: str = "data",
    id_col: str = "media_id",
    n_frames: int = 4,
) -> DataFrame:
    """video binary → n sampled frame rows (explode pattern for media).

    STUB sampler: slices the byte stream deterministically; production
    replaces the kernel with a real demuxer.  The output shape —
    (media_id, frame_idx, frame_bytes) — is what a downstream image
    pipeline consumes.
    """
    out_schema = f"{id_col} long, frame_idx int, frame_bytes binary"

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, raw in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(raw or b"")
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(id_col, binary_col).mapInPandas(_mapper, out_schema)


def resize_images(
    df: DataFrame,
    *,
    binary_col: str = "data",
    id_col: str = "media_id",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize stage.  STUB kernel (raises on use without a real codec)
    wired through the same mapInPandas plumbing — swap the kernel, keep the
    plan."""
    out_schema = f"{id_col} long, resized binary"

    def _mapper(batches: Iterator) -> Iterator:
        raise NotImplementedError(
            "image codec not available in this container; plug a Pillow "
            "kernel into resize_images(decoder=...) in production"
        )
        yield  # pragma: no cover

    return df.select(id_col, binary_col).mapInPandas(_mapper, out_schema)
