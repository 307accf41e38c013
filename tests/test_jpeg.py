"""Pure-numpy baseline JPEG codec tests.

``encode_jpeg`` lives in the product (write path for re-encode/thumbnail
export); correctness of the DECODER does not rest on it alone — the
bit-exact test below compares decoder output against an INDEPENDENT
dequant+IDCT reference implemented here from the T.81 math, so a symmetric
encoder/decoder bug cannot hide."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from preprocessor_spark.operators.jpeg import _C, ZIGZAG, decode_jpeg, encode_jpeg


def _ref_decode_gray(img, qval):
    """Independent reference: forward DCT + quantize (own implementation),
    then dequant + IDCT — what a correct decoder must output for a gray
    encode at uniform step qval."""
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("kn,bcnm,ml->bckl", _C, blocks, _C.T)
    quant = np.round(coefs.reshape(by, bx, 64)[:, :, ZIGZAG] / qval)
    deq = quant * qval
    lin = np.zeros((by, bx, 64))
    lin[:, :, ZIGZAG] = deq
    spatial = np.einsum("kn,bckl,lm->bcnm", _C, lin.reshape(by, bx, 8, 8), _C) + 128.0
    full = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)[:h, :w]
    return np.clip(full, 0, 255).astype(np.float32) / 255.0


def test_gray_roundtrip_bit_exact_vs_reference():
    """Entropy coding + bitstream must recover EXACTLY the planted quantized
    coefficients: decoder output equals the independent dequant+IDCT
    reference to float tolerance."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (21, 18)).astype(np.uint8)  # non-multiple-of-8
    got = decode_jpeg(encode_jpeg(img, qval=2))
    np.testing.assert_allclose(got, _ref_decode_gray(img, 2), atol=1e-6)


def test_gray_near_lossless_q1():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, qval=1))
    err = np.abs(got - img.astype(np.float32) / 255.0)
    assert err.max() < 4 / 255 and err.mean() < 1 / 255


def test_color_444_and_420_with_restarts():
    # smooth gradient: chroma subsampling loses little, tolerance stays tight
    yy, xx = np.mgrid[0:24, 0:31]
    img = np.stack(
        [
            (xx * 8) % 256,
            (yy * 8) % 256,
            ((xx + yy) * 4) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    ref = img.astype(np.float32).mean(axis=2) / 255.0
    got444 = decode_jpeg(encode_jpeg(img, qval=1))
    assert np.abs(got444 - ref).mean() < 0.01
    got420 = decode_jpeg(encode_jpeg(img, qval=1, subsample=True, restart=2))
    assert np.abs(got420 - ref).mean() < 0.02


def test_progressive_without_scan_raises():
    """SOF2 alone (no SOS) is malformed, not a PIL fallback case — the
    decoder owns progressive now and reports the real problem."""
    body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + bytes([0xFF, 0xC2])
        + struct.pack(">H", len(body) + 2)
        + body
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="without SOF/SOS"):
        decode_jpeg(payload)


def test_decode_image_dispatches_jpeg(spark):
    from preprocessor_spark.operators.multimodal import decode_image, image_features

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    payload = encode_jpeg(img, qval=1)
    got = decode_image(payload)
    assert got.shape == (16, 16)
    df = spark.createDataFrame([(0, payload)], "id bigint, img binary")
    feats = image_features(df, "id", "img").toPandas()
    assert feats.width.tolist() == [16] and feats.height.tolist() == [16]
    assert abs(feats.mean_intensity.iloc[0] - got.mean()) < 1e-6


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------

def test_progressive_bitexact_vs_baseline_matrix():
    """Every Annex G scan type in play: DC/AC first + refinement passes,
    4:4:4 and 4:2:0, gray and RGB, non-multiple-of-8 dims, one and two
    successive-approximation levels, and spectral-selection-only (al=0).
    The progressive stream carries the same quantized coefficients, so the
    decode must be BIT-identical to decoding the baseline encoding."""
    from preprocessor_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    cases = [
        ((16, 16), False, 1),
        ((23, 17), False, 1),
        ((23, 17, 3), False, 1),
        ((23, 17, 3), True, 1),
        ((8, 8), False, 0),
        ((40, 33, 3), True, 2),
        ((5, 5), False, 1),
    ]
    for shape, sub, al in cases:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, qval=2, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, qval=2, subsample=sub, al=al))
        assert np.array_equal(base, prog), (shape, sub, al)


def test_progressive_smooth_image_eob_runs():
    """A flat image maximizes EOB/zero-run paths; a gradient exercises
    small-magnitude refinement bits."""
    from preprocessor_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    flat = np.full((24, 24), 130, dtype=np.uint8)
    grad = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
    for img in (flat, grad):
        base = decode_jpeg(encode_jpeg(img, qval=2))
        prog = decode_jpeg(encode_jpeg_progressive(img, qval=2, al=1))
        assert np.array_equal(base, prog)


def test_decode_image_handles_progressive_without_pil():
    from preprocessor_spark.operators.jpeg import encode_jpeg_progressive
    from preprocessor_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (20, 14, 3)).astype(np.uint8)
    out = decode_image(encode_jpeg_progressive(img, qval=2, subsample=True))
    assert out.shape == (20, 14)
    assert 0.0 <= out.min() and out.max() <= 1.0
