"""Pure-numpy baseline JPEG decoder tests.

The planted encoder here is an independent baseline JPEG writer (forward
DCT, quantize, zigzag, Huffman, byte stuffing, markers) so the decoder is
exercised against real T.81 bitstreams it did not produce itself — including
4:2:0 interleave and restart markers. Custom-but-valid canonical Huffman
tables are written into DHT (the decoder must read tables from the stream,
not assume Annex K)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from preprocessor_spark.operators.jpeg import _C, ZIGZAG, decode_jpeg

# canonical tables: all 12 DC categories at code length 4; all 162 AC
# symbols at code length 8 (both leave the all-ones code unused, as T.81
# requires)
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
AC_BITS = [0] * 7 + [len(AC_VALS)] + [0] * 8


def _codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


DC_CODE = _codes(DC_BITS, DC_VALS)
AC_CODE = _codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _category(v):
    n = 0
    a = abs(v)
    while a:
        a >>= 1
        n += 1
    return n


def _put_coeff(bw, code_table, sym, v, n):
    length, code = code_table[sym]
    bw.put(code, length)
    if n:
        bw.put(v if v >= 0 else v + (1 << n) - 1, n)


def _encode_blocks(bw, blocks, pred):
    """blocks: (N, 64) quantized zigzag coefficients for one component run."""
    for b in blocks:
        diff = int(b[0]) - pred
        pred = int(b[0])
        n = _category(diff)
        _put_coeff(bw, DC_CODE, n, diff, n)
        run = 0
        last = 63
        while last > 0 and b[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(b[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                _put_coeff(bw, AC_CODE, 0xF0, 0, 0)
                run -= 16
            n = _category(v)
            _put_coeff(bw, AC_CODE, (run << 4) | n, v, n)
            run = 0
        if last < 63:
            _put_coeff(bw, AC_CODE, 0x00, 0, 0)
    return pred


def _plane_blocks(plane, q):
    """Pad to 8-multiples (edge replicate), DCT+quantize → (by, bx, 64)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64) - 128.0
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("kn,bcnm,ml->bckl", _C, blocks, _C.T)
    # stream (zigzag) order: position i carries linear coefficient ZIGZAG[i]
    zz = np.round(coefs.reshape(by, bx, 64)[:, :, ZIGZAG] / q)
    return zz.astype(np.int64)


def encode_jpeg(img, qval=1, subsample=False, restart=0):
    """img: (h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qtab = np.full(64, qval, dtype=np.int64)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))
    grids = []
    for p, (sh, sv) in zip(planes, samp):
        gh, gw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.pad(p, ((0, gh - p.shape[0]), (0, gw - p.shape[1])), mode="edge")
        grids.append(_plane_blocks(pp, qtab))

    bw = _BitWriter()
    preds = [0] * len(planes)
    data = bytearray()
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                bw.flush()
                data += bw.out
                data += b"\xff" + bytes([0xD0 + ((mcu // restart - 1) % 8)])
                bw = _BitWriter()
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        blk = grids[ci][my * sv + by, mx * sh + bx][None, :]
                        preds[ci] = _encode_blocks(bw, blk, preds[ci])
            mcu += 1
    bw.flush()
    data += bw.out

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(qtab.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(data)
    out += b"\xff\xd9"
    return out


def _ref_decode_gray(img, qval):
    """Independent pipeline reference: what a correct decoder must output for
    a q=qval gray encode — IDCT of the quantized coefficients."""
    h, w = img.shape
    blocks = _plane_blocks(img.astype(np.float64), np.full(64, qval, dtype=np.int64))
    deq = blocks.astype(np.float64) * qval
    by, bx = deq.shape[0], deq.shape[1]
    spatial = np.zeros((by, bx, 8, 8))
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


def test_progressive_raises():
    body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + bytes([0xFF, 0xC2])
        + struct.pack(">H", len(body) + 2)
        + body
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError):
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
