"""WebP lossless (VP8L) codec tests — encoder-built bit-exact round trips
(the test_jpeg.py discipline) plus hand-rolled bitstreams for the decoder
features the minimal encoder never emits: LZ77 backrefs (long-distance AND
close-neighborhood codes), the color cache, SUBTRACT_GREEN / PREDICTOR /
COLOR / COLOR_INDEXING inverse transforms, and the lossy-VP8 gate."""

import struct

import numpy as np
import pytest

from preprocessor_spark.operators.webp import (
    _BitWriter,
    _canonical_codes,
    _huff_lengths,
    _write_msb_code,
    _write_prefix_code,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


def _vp8l_of(data: bytes) -> bytes:
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    (size,) = struct.unpack("<I", data[16:20])
    return data[20 : 20 + size]


def _wrap(vp8l_payload: bytes) -> bytes:
    """VP8L bitstream body (without the 0x2f byte) → whole .webp file."""
    vp8l = b"\x2f" + vp8l_payload
    pad = b"\x00" if len(vp8l) & 1 else b""
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l + pad
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


class _Codes:
    """Write symbols through explicit prefix codes (test-side encoder)."""

    def __init__(self, bw, alphabet, freqs):
        lengths = [0] * alphabet
        for s, f in freqs.items():
            lengths[s] = 1  # placeholder; recomputed below
        hist = [0] * alphabet
        for s, f in freqs.items():
            hist[s] = f
        self.lengths = _huff_lengths(hist)
        _write_prefix_code(bw, self.lengths)
        self.codes = _canonical_codes(self.lengths)
        self.bw = bw

    def emit(self, sym):
        c, n = self.codes[sym]
        if n:
            _write_msb_code(self.bw, c, n)


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def test_roundtrip_random_rgba_shapes():
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (1, 9), (7, 1), (16, 16), (33, 47)]:
        img = rng.integers(0, 256, (*shape, 4), dtype=np.uint8)
        got = decode_vp8l(_vp8l_of(encode_webp_lossless(img)))
        assert np.array_equal(got, img), shape


def test_roundtrip_gradient_and_constant():
    x = np.linspace(0, 255, 40, dtype=np.uint8)
    grad = np.tile(x, (25, 1))
    img = np.stack([grad, grad[::-1], grad, np.full_like(grad, 255)], axis=2)
    assert np.array_equal(decode_vp8l(_vp8l_of(encode_webp_lossless(img))), img)
    const = np.full((9, 9, 4), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_vp8l(_vp8l_of(encode_webp_lossless(const))), const
    )


def test_decode_webp_luma_and_grayscale_entry():
    g = np.arange(0, 250, dtype=np.uint8).reshape(10, 25)
    lum = decode_webp(encode_webp_lossless(g))
    assert lum.shape == (10, 25)
    assert np.allclose(lum, g / 255.0, atol=1e-6)


def test_decode_image_router_handles_webp():
    from preprocessor_spark.operators.multimodal import decode_image

    g = np.arange(0, 200, 2, dtype=np.uint8).reshape(10, 10)
    arr = decode_image(encode_webp_lossless(g))
    assert arr.shape == (10, 10)
    assert np.allclose(arr, g / 255.0, atol=1e-6)


def test_lossy_vp8_gate_and_bad_container():
    fake_vp8 = (
        b"RIFF" + struct.pack("<I", 12 + 8 + 4) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        decode_webp(fake_vp8)
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")


def test_lz77_long_distance_and_close_neighborhood():
    """One literal row then backrefs: dist code > 120 (absolute) and a
    close-neighborhood code (maps to (0,1) = one row up)."""
    w, h = 8, 3
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta
    # row 0: 8 literals green=i, r=3, b=5, a=255
    # then: length-8 backref with absolute dist 8 (code 8+120=128),
    # then: length-8 backref with close code 1 -> (0,1) -> dist 8.
    # length 8 -> prefix sym: 8 = offset+extra+1; sym 5: extra=(5-2)>>1=1,
    # offset=(2+1)<<1=6, L=6+rb+1 -> rb=1 => L=8. dist 128: sym for 128:
    # sym 13: extra=(13-2)>>1=5, offset=(2+1)<<5=96, v=96+rb+1, rb=31 =>128
    # close code 1: v=1 -> sym 0 extra 0.
    green = _Codes(
        bw, 256 + 24, {i: 5 for i in range(8)} | {256 + 5: 2}
    )
    red = _Codes(bw, 256, {3: 1})
    blue = _Codes(bw, 256, {5: 1})
    alpha = _Codes(bw, 256, {255: 1})
    dist = _Codes(bw, 40, {13: 1, 0: 1})
    for i in range(8):
        green.emit(i)
        red.emit(3)
        blue.emit(5)
        alpha.emit(255)
    green.emit(256 + 5)
    bw.write(1, 1)  # length extra bits (rb=1)
    dist.emit(13)
    bw.write(31, 5)  # dist extra bits
    green.emit(256 + 5)
    bw.write(1, 1)
    dist.emit(0)  # close-neighborhood code 1 -> (0,1)
    rgba = decode_vp8l(b"\x2f" + bw.done())
    assert rgba.shape == (3, 8, 4)
    for y in range(3):
        assert list(rgba[y, :, 1]) == list(range(8))  # green
    assert (rgba[:, :, 0] == 3).all() and (rgba[:, :, 2] == 5).all()
    assert (rgba[:, :, 3] == 255).all()


def test_color_cache_hits():
    """Literal inserts into the cache; later pixels come from cache
    symbols. cache_bits=4; index = (0x1e35a7bd * argb) >> 28."""
    w, h = 4, 1
    px = (255 << 24) | (10 << 16) | (20 << 8) | 30
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 28
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(4, 4)  # cache_bits = 4 -> 16 entries
    bw.write(0, 1)  # no meta
    cache_sym = 256 + 24 + idx
    green = _Codes(bw, 256 + 24 + 16, {20: 1, cache_sym: 3})
    red = _Codes(bw, 256, {10: 1})
    blue = _Codes(bw, 256, {30: 1})
    alpha = _Codes(bw, 256, {255: 1})
    dist = _Codes(bw, 40, {0: 1})
    green.emit(20)
    red.emit(10)
    blue.emit(30)
    alpha.emit(255)
    for _ in range(3):
        green.emit(cache_sym)
    rgba = decode_vp8l(b"\x2f" + bw.done())
    assert (rgba[:, :, 0] == 10).all()
    assert (rgba[:, :, 1] == 20).all()
    assert (rgba[:, :, 2] == 30).all()


def _literal_image_stream(bw, argb_rows):
    """Write a literal-only spatially-coded image (no cache, used for
    transform sub-images and main images in the transform tests)."""
    flat = [px for row in argb_rows for px in row]
    gs = {}
    rs = {}
    bs = {}
    as_ = {}
    for px in flat:
        gs[(px >> 8) & 0xFF] = gs.get((px >> 8) & 0xFF, 0) + 1
        rs[(px >> 16) & 0xFF] = rs.get((px >> 16) & 0xFF, 0) + 1
        bs[px & 0xFF] = bs.get(px & 0xFF, 0) + 1
        as_[(px >> 24) & 0xFF] = as_.get((px >> 24) & 0xFF, 0) + 1
    bw.write(0, 1)  # no color cache
    green = _Codes(bw, 256 + 24, gs)
    red = _Codes(bw, 256, rs)
    blue = _Codes(bw, 256, bs)
    alpha = _Codes(bw, 256, as_)
    dist = _Codes(bw, 40, {0: 1})
    for px in flat:
        green.emit((px >> 8) & 0xFF)
        red.emit((px >> 16) & 0xFF)
        blue.emit(px & 0xFF)
        alpha.emit((px >> 24) & 0xFF)


def test_subtract_green_inverse():
    w, h = 3, 2
    # residual pixels: r' = r - g, b' = b - g (mod 256)
    want = np.zeros((h, w, 4), dtype=np.uint8)
    rng = np.random.default_rng(3)
    want[:, :, :3] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    want[:, :, 3] = 255
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            r, g, b = int(want[y, x, 0]), int(want[y, x, 1]), int(want[y, x, 2])
            row.append(
                (255 << 24) | (((r - g) & 0xFF) << 16) | (g << 8) | ((b - g) & 0xFF)
            )
        rows.append(row)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no meta (level0)  -- wait: meta bit comes after cache
    # NOTE: order is cache bit (inside _literal_image_stream) then meta;
    # _literal_image_stream writes the cache bit, so write meta before it:
    # rebuild properly below.
    bw2 = _BitWriter()
    _header(bw2, w, h)
    bw2.write(1, 1)
    bw2.write(2, 2)
    bw2.write(0, 1)
    # spatially-coded image: cache bit, then meta bit, then codes
    flat = [px for row in rows for px in row]
    bw2.write(0, 1)  # no cache
    bw2.write(0, 1)  # no meta
    gs = {}
    rs = {}
    bs = {}
    as_ = {}
    for px in flat:
        gs[(px >> 8) & 0xFF] = gs.get((px >> 8) & 0xFF, 0) + 1
        rs[(px >> 16) & 0xFF] = rs.get((px >> 16) & 0xFF, 0) + 1
        bs[px & 0xFF] = bs.get(px & 0xFF, 0) + 1
        as_[(px >> 24) & 0xFF] = as_.get((px >> 24) & 0xFF, 0) + 1
    green = _Codes(bw2, 256 + 24, gs)
    red = _Codes(bw2, 256, rs)
    blue = _Codes(bw2, 256, bs)
    alpha = _Codes(bw2, 256, as_)
    dist = _Codes(bw2, 40, {0: 1})
    for px in flat:
        green.emit((px >> 8) & 0xFF)
        red.emit((px >> 16) & 0xFF)
        blue.emit(px & 0xFF)
        alpha.emit((px >> 24) & 0xFF)
    rgba = decode_vp8l(b"\x2f" + bw2.done())
    assert np.array_equal(rgba, want)


def test_color_indexing_inverse_with_bundling():
    """4-color palette -> width_bits=2 (4 pixels per packed byte)."""
    w, h = 10, 2
    palette = [0xFF000000, 0xFF0000FF, 0xFF00FF00, 0xFFFF0000]
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, (h, w))
    packed_w = (w + 3) // 4
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3, 8)  # n_colors - 1
    # palette sub-image (1 row, n_colors wide), delta-coded per channel
    deltas = []
    prev = 0
    for px in palette:
        d = 0
        for shift in (24, 16, 8, 0):
            dc = ((px >> shift) - (prev >> shift)) & 0xFF
            d |= dc << shift
        deltas.append(d)
        prev = px
    _literal_image_stream(bw, [deltas])
    bw.write(0, 1)  # no more transforms
    # main (packed) image: each packed pixel's green holds 4x 2-bit idx
    rows = []
    for y in range(h):
        row = []
        for px_i in range(packed_w):
            gval = 0
            for i in range(4):
                x = px_i * 4 + i
                if x < w:
                    gval |= int(idx[y, x]) << (2 * i)
            row.append((255 << 24) | (gval << 8))
        rows.append(row)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    flat = [px for row in rows for px in row]
    gs = {}
    for px in flat:
        gs[(px >> 8) & 0xFF] = gs.get((px >> 8) & 0xFF, 0) + 1
    green = _Codes(bw, 256 + 24, gs)
    red = _Codes(bw, 256, {0: 1})
    blue = _Codes(bw, 256, {0: 1})
    alpha = _Codes(bw, 256, {255: 1})
    dist = _Codes(bw, 40, {0: 1})
    for px in flat:
        green.emit((px >> 8) & 0xFF)
        red.emit(0)
        blue.emit(0)
        alpha.emit(255)
    rgba = decode_vp8l(b"\x2f" + bw.done())
    want = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px = palette[int(idx[y, x])]
            want[y, x] = [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF, px >> 24]
    assert np.array_equal(rgba, want)


def test_predictor_transform_mode_top():
    """Uniform predictor mode 2 (= top pixel): residuals of a vertical
    gradient are constant rows; the inverse must rebuild the gradient.
    Borders follow the spec: (0,0) predicts 0xff000000, row 0 predicts
    left, column 0 predicts top."""
    w, h = 4, 4
    want = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        want[y, :, 0] = 10 * y + 5
        want[y, :, 1] = 20 * y + 3
        want[y, :, 2] = 30 * y + 1
        want[y, :, 3] = 255
    # compute residuals under the full border rules + mode 2 in the body
    res = np.zeros_like(want, dtype=np.int64)
    chans = want[:, :, [3, 0, 1, 2]].astype(np.int64)  # a,r,g,b order
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = chans[0, x - 1]
            elif x == 0:
                pred = chans[y - 1, 0]
            else:
                pred = chans[y - 1, x]  # mode 2
            res[y, x] = (chans[y, x] - pred) & 0xFF
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits = 2+2 = 4 -> one 16x16 block covers all
    # sub-image: 1x1, mode 2 in green channel
    _literal_image_stream(bw, [[(255 << 24) | (2 << 8)]])
    bw.write(0, 1)  # no more transforms
    rows = []
    for y in range(h):
        rows.append(
            [
                (int(res[y, x, 0]) << 24)
                | (int(res[y, x, 1]) << 16)
                | (int(res[y, x, 2]) << 8)
                | int(res[y, x, 3])
                for x in range(w)
            ]
        )
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    flat = [px for row in rows for px in row]
    gs = {}
    rs = {}
    bs = {}
    as_ = {}
    for px in flat:
        gs[(px >> 8) & 0xFF] = gs.get((px >> 8) & 0xFF, 0) + 1
        rs[(px >> 16) & 0xFF] = rs.get((px >> 16) & 0xFF, 0) + 1
        bs[px & 0xFF] = bs.get(px & 0xFF, 0) + 1
        as_[(px >> 24) & 0xFF] = as_.get((px >> 24) & 0xFF, 0) + 1
    green = _Codes(bw, 256 + 24, gs)
    red = _Codes(bw, 256, rs)
    blue = _Codes(bw, 256, bs)
    alpha = _Codes(bw, 256, as_)
    dist = _Codes(bw, 40, {0: 1})
    for px in flat:
        green.emit((px >> 8) & 0xFF)
        red.emit((px >> 16) & 0xFF)
        blue.emit(px & 0xFF)
        alpha.emit((px >> 24) & 0xFF)
    rgba = decode_vp8l(b"\x2f" + bw.done())
    assert np.array_equal(rgba, want)


def test_media_meta_webp_dims_agree_with_decode():
    """Header sniffing (media_meta) and the full decoder must agree on
    dimensions for encoder-built lossless files."""
    from preprocessor_spark.operators.media_meta import sniff_image_meta

    g = np.zeros((21, 34), dtype=np.uint8)
    payload = encode_webp_lossless(g)
    meta = sniff_image_meta(payload)
    assert meta["format"] == "webp"
    assert (meta["width"], meta["height"]) == (34, 21)


def test_truncated_and_corrupt_streams_raise_cleanly():
    """Corrupt payloads must raise ValueError, never hang or index-crash."""
    g = np.arange(100, dtype=np.uint8).reshape(10, 10)
    good = encode_webp_lossless(g)
    vp8l = _vp8l_of(good)
    # truncated at several depths inside the bitstream
    for cut in (1, 3, 8, len(vp8l) // 2, len(vp8l) - 1):
        with pytest.raises(ValueError):
            decode_vp8l(vp8l[:cut])
    # bad signature byte
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00" + vp8l[1:])
    # nonzero version bits
    bw = _BitWriter()
    bw.write(9, 14)
    bw.write(9, 14)
    bw.write(0, 1)
    bw.write(5, 3)  # version 5
    with pytest.raises(ValueError, match="version"):
        decode_vp8l(b"\x2f" + bw.done())


def test_oversubscribed_prefix_code_rejected():
    """A code-length assignment violating Kraft must raise, not decode
    garbage."""
    from preprocessor_spark.operators.webp import _Prefix

    with pytest.raises(ValueError, match="not complete|no symbols"):
        _Prefix([1, 1, 1])  # kraft 1.5
    with pytest.raises(ValueError, match="not complete|no symbols"):
        _Prefix([2, 2, 2])  # kraft 0.75 (incomplete)
    with pytest.raises(ValueError, match="no symbols"):
        _Prefix([0, 0])


def test_backref_out_of_range_rejected():
    """An LZ77 distance pointing before the image start must raise."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    green = _Codes(bw, 256 + 24, {7: 1, 256 + 5: 1})
    red = _Codes(bw, 256, {0: 1})
    blue = _Codes(bw, 256, {0: 1})
    alpha = _Codes(bw, 256, {255: 1})
    dist = _Codes(bw, 40, {13: 1})
    green.emit(7)
    red.emit(0)
    blue.emit(0)
    alpha.emit(255)
    green.emit(256 + 5)  # length 8 > remaining 3 AND dist 128 > pos 1
    bw.write(1, 1)
    dist.emit(13)
    bw.write(31, 5)
    with pytest.raises(ValueError, match="backward reference"):
        decode_vp8l(b"\x2f" + bw.done())
