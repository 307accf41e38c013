"""Multimodal (image/audio/video) column plumbing.

Design per the north star: media travels as opaque ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas`` so each batch amortizes
Python transfer.

Decode status:
- **REAL, pure numpy** (no external libs): PPM/PGM (P5/P6) and uncompressed
  24/32-bit BMP — full header parse, raster decode, nearest-neighbor
  resize, PGM re-encode. Tested pixel-exact.
- **Gated**: PNG/JPEG decode needs PIL (absent in this container) — tried
  via import, raises a clear NotImplementedError otherwise.
- **Stub**: video frame sampling needs ffmpeg — NotImplementedError.
- A deterministic content-hash fake (``decoder="fake"``) remains for
  plumbing tests over arbitrary (non-image) payloads.
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
    content hash. Used for plumbing tests over arbitrary payloads."""
    h = hashlib.blake2b(payload or b"", digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(8, 8).astype(np.float32) / 255.0


def _decode_pnm(payload: bytes) -> np.ndarray:
    """PPM (P6, RGB) / PGM (P5, gray) binary-raster decode, pure numpy."""
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens ('#' comments allowed), then a single whitespace byte, then the
    # raster
    tokens: list[int] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace separating header from raster
    w, h, maxval = tokens
    channels = 3 if payload[:2] == b"P6" else 1
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    raster = np.frombuffer(payload, dtype=dtype, count=w * h * channels, offset=i)
    img = raster.reshape(h, w, channels).astype(np.float32) / float(maxval)
    return img.mean(axis=2) if channels == 3 else img[:, :, 0]


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP decode, pure numpy (BITMAPINFOHEADER)."""
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * abs(h), offset=off)
    img = rows.reshape(abs(h), stride)[:, : w * nch].reshape(abs(h), w, nch)
    if h > 0:  # positive height = bottom-up storage
        img = img[::-1]
    # BGR(A) order; average BGR channels to grayscale
    return img[:, :, :3].astype(np.float32).mean(axis=2) / 255.0


def decode_image(payload: bytes) -> np.ndarray:
    """Decode to a float32 grayscale [0,1] 2-D array.

    PPM/PGM and uncompressed BMP decode here with no external dependency;
    PNG/JPEG fall through to PIL when available."""
    if not payload:
        raise ValueError("empty image payload")
    magic = payload[:2]
    if magic in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if magic == b"BM":
        return _decode_bmp(payload)
    try:  # compressed formats need a real imaging lib
        import io

        from PIL import Image  # noqa: PLC0415

        arr = np.asarray(Image.open(io.BytesIO(payload)).convert("L"), dtype=np.float32)
        return arr / 255.0
    except ImportError as exc:
        raise NotImplementedError(
            f"format with magic {magic!r} requires PIL, which is not installed"
        ) from exc


def _resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index mapping (pure numpy)."""
    ys = (np.arange(height) * (img.shape[0] / height)).astype(np.int64)
    xs = (np.arange(width) * (img.shape[1] / width)).astype(np.int64)
    return img[ys][:, xs]


def _encode_pgm(img: np.ndarray) -> bytes:
    """float [0,1] grayscale → binary PGM (P5) bytes."""
    u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    h, w = u8.shape
    return b"P5\n%d %d\n255\n" % (w, h) + u8.tobytes()


IMAGE_FEATURES_SCHEMA = (
    "id bigint, mean_intensity double, std_intensity double, width int, height int"
)


def image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    batch_hint: int = 1024,
    decoder: str = "auto",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    ``decoder="auto"`` uses the real decoders (PPM/PGM/BMP pure-numpy,
    PIL fallback for compressed formats); ``decoder="fake"`` uses the
    deterministic content-hash stand-in for non-image payloads. Arrow
    batches stream through the iterator; each batch is vectorized numpy.
    """
    if decoder not in ("auto", "fake"):
        raise ValueError(f"decoder must be 'auto' or 'fake', got {decoder!r}")
    decode = decode_image if decoder == "auto" else _fake_decode_image

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [decode(b) for b in pdf[binary_col]]
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


RESIZED_SCHEMA = "id bigint, payload binary, width int, height int"


def resize_images(
    df: DataFrame, id_col: str, binary_col: str, width: int, height: int
) -> DataFrame:
    """REAL resize for decodable formats: decode (PPM/PGM/BMP pure-numpy,
    PIL when present), nearest-neighbor resample, re-encode as binary PGM.
    Arrow-batched mapInPandas; per-row work is pure numpy indexing."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _encode_pgm(_resize_nearest(decode_image(b), width, height))
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_resize, RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, id_col: str, binary_col: str, every_ms: int) -> DataFrame:
    """STUB: frame sampling requires ffmpeg bindings."""
    raise NotImplementedError(
        "Video frame sampling requires ffmpeg, not present in this container."
    )
