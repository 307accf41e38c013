"""Multimodal (image/audio/video) column plumbing.

Design per the north star: media travels as opaque ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas`` so each batch amortizes
Python transfer. The media libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are STUBBED — either a clearly-marked
``NotImplementedError`` or a deterministic fake — while everything
Spark-side (schema, partitioning, UDF signatures, batch iteration) is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (sizes are
    computable; pixel dims/duration need decode → left null until then)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("bigint").alias("n_bytes"),
        ),
    )


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: derives an 8x8 grayscale 'image' from the
    content hash. Stands in for PIL.Image.open until the real lib exists."""
    h = hashlib.blake2b(payload or b"", digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(8, 8).astype(np.float32) / 255.0


IMAGE_FEATURES_SCHEMA = (
    "id bigint, mean_intensity double, std_intensity double, width int, height int"
)


def image_features(df: DataFrame, id_col: str, binary_col: str, batch_hint: int = 1024) -> DataFrame:
    """Decode (stub) + feature-extract via mapInPandas.

    Real plumbing: Arrow batches stream through the iterator; each batch is
    vectorized numpy. Swap ``_fake_decode_image`` for a real decoder when
    the imaging lib is available.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [_fake_decode_image(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "mean_intensity": [float(a.mean()) for a in imgs],
                    "std_intensity": [float(a.std()) for a in imgs],
                    "width": [a.shape[1] for a in imgs],
                    "height": [a.shape[0] for a in imgs],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, binary_col: str, width: int, height: int) -> DataFrame:
    """STUB: resize requires a real imaging library."""
    raise NotImplementedError(
        "Image resize requires an imaging library (PIL/opencv) not present in "
        "this container; the mapInPandas plumbing mirrors image_features()."
    )


def sample_video_frames(df: DataFrame, id_col: str, binary_col: str, every_ms: int) -> DataFrame:
    """STUB: frame sampling requires ffmpeg bindings."""
    raise NotImplementedError(
        "Video frame sampling requires ffmpeg, not present in this container."
    )
