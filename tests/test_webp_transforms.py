"""VP8L decoder coverage for the paths real libwebp encodings use that the
planted-encoder round-trips never emit (round-12 ADVICE item): all 14
predictor modes including the top-right-aliases-row-start edge, the COLOR
transform, meta-prefix entropy groups, and code-length streams using the
repeat ops 16/17/18 and the max_symbol shortcut.

Expected pixels are computed two ways: a test-side reference written from
the spec text (a second implementation — catches transcription bugs), and
HAND-WORKED scalar cases with the arithmetic spelled out in comments
(independent of any implementation — catches shared misreads of the
prediction formulas)."""

import numpy as np
import pytest

from preprocessor_spark.operators.webp import (
    _BitReader,
    _BitWriter,
    _read_prefix_code,
    decode_vp8l,
)
from tests.test_webp import _Codes, _header, _literal_image_stream


def _emit_main_literals(bw, rows):
    """Main spatially-coded image: cache bit, meta bit, codes, pixels."""
    flat = [px for row in rows for px in row]
    hists = [{} for _ in range(4)]
    for px in flat:
        for i, v in enumerate(
            ((px >> 8) & 0xFF, (px >> 16) & 0xFF, px & 0xFF, (px >> 24) & 0xFF)
        ):
            hists[i][v] = hists[i].get(v, 0) + 1
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    green = _Codes(bw, 256 + 24, hists[0])
    red = _Codes(bw, 256, hists[1])
    blue = _Codes(bw, 256, hists[2])
    alpha = _Codes(bw, 256, hists[3])
    _Codes(bw, 40, {0: 1})  # distance code, unused
    for px in flat:
        green.emit((px >> 8) & 0xFF)
        red.emit((px >> 16) & 0xFF)
        blue.emit(px & 0xFF)
        alpha.emit((px >> 24) & 0xFF)


def _pack(res):
    """(h, w, 4) a,r,g,b residual ints → ARGB rows."""
    return [
        [
            (int(res[y, x, 0]) << 24)
            | (int(res[y, x, 1]) << 16)
            | (int(res[y, x, 2]) << 8)
            | int(res[y, x, 3])
            for x in range(res.shape[1])
        ]
        for y in range(res.shape[0])
    ]


def _spec_predict(mode, L, T, TL, TR):
    """Predictor table transcribed from the VP8L spec (§4.4 predictor
    transform) — a second implementation, independent of webp.py's."""
    L, T, TL, TR = (np.asarray(v, dtype=np.int64) for v in (L, T, TL, TR))

    def avg2(p, q):
        return (p + q) >> 1

    if mode == 0:
        return np.array([255, 0, 0, 0])
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg2(avg2(L, TR), T)
    if mode == 6:
        return avg2(L, TL)
    if mode == 7:
        return avg2(L, T)
    if mode == 8:
        return avg2(TL, T)
    if mode == 9:
        return avg2(T, TR)
    if mode == 10:
        return avg2(avg2(L, TL), avg2(T, TR))
    if mode == 11:  # Select: lower total deviation of p = L+T-TL wins
        p = L + T - TL
        return L if np.abs(p - L).sum() < np.abs(p - T).sum() else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L + T - TL, 0, 255)
    # 13: ClampAddSubtractHalf — C-style truncating (a - b) / 2
    ave = avg2(L, T)
    d = ave - TL
    return np.clip(ave + np.sign(d) * (np.abs(d) // 2), 0, 255)


def _predictor_stream(mode, want, size_bits=2):
    """Encode `want` (h, w, 4 RGBA) behind a PREDICTOR transform whose
    every block carries `mode`; residuals derived with _spec_predict."""
    h, w = want.shape[:2]
    chans = want[:, :, [3, 0, 1, 2]].astype(np.int64)  # a,r,g,b
    res = np.zeros_like(chans)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = chans[0, x - 1]
            elif x == 0:
                pred = chans[y - 1, 0]
            else:
                L = chans[y, x - 1]
                T = chans[y - 1, x]
                TL = chans[y - 1, x - 1]
                # spec/libwebp: top-right of the last column aliases the
                # first pixel of the CURRENT row
                TR = chans[y - 1, x + 1] if x + 1 < w else chans[y, 0]
                pred = _spec_predict(mode, L, T, TL, TR)
            res[y, x] = (chans[y, x] - pred) & 0xFF
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(size_bits - 2, 3)
    blocks_w = (w + (1 << size_bits) - 1) >> size_bits
    blocks_h = (h + (1 << size_bits) - 1) >> size_bits
    sub_px = (255 << 24) | (mode << 8)
    _literal_image_stream(bw, [[sub_px] * blocks_w for _ in range(blocks_h)])
    bw.write(0, 1)  # no more transforms
    _emit_main_literals(bw, _pack(res))
    return b"\x2f" + bw.done()


class TestPredictorModes:
    @pytest.mark.parametrize("mode", list(range(14)))
    def test_every_mode_rebuilds_patterned_image(self, mode):
        """5×5 (odd size: the 2×2-block sub-image and the x = w-1
        top-right alias both engage) with per-channel patterns."""
        h = w = 5
        want = np.zeros((h, w, 4), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                for c in range(4):
                    want[y, x, c] = (31 * x + 57 * y + 13 * c + mode) % 256
        got = decode_vp8l(_predictor_stream(mode, want))
        assert np.array_equal(got, want), mode

    @pytest.mark.parametrize(
        "mode,pred_r",
        [
            # 2×2 image, red channel: out = [[100, 50], [20, ?]], g=b=0,
            # alpha 255. At (1,1): L=20, T=50, TL=100, TR aliases row
            # start out[1,0] = 20 (x+1 == w). Hand arithmetic:
            (3, 20),   # TR = 20
            (5, 35),   # avg2(avg2(L=20, TR=20)=20, T=50) = 70>>1 = 35
            (11, 20),  # p=L+T-TL=-30: sum|p-L|=|{-30}-20|=50 < sum|p-T|=80 -> L
            (12, 0),   # clip(20+50-100) = clip(-30) = 0
            (13, 3),   # ave=avg2(20,50)=35; d=35-100=-65; 35-(65//2)=35-32=3
        ],
    )
    def test_hand_worked_corner_pixel(self, mode, pred_r):
        """Literal hand-computed predictions (worked in the comments
        above, no implementation involved): the residual is built from
        the hand value, so a formula misread in the decoder breaks the
        reconstructed pixel."""
        h = w = 2
        want = np.zeros((h, w, 4), dtype=np.uint8)
        want[:, :, 3] = 255
        want[0, 0, 0], want[0, 1, 0], want[1, 0, 0], want[1, 1, 0] = 100, 50, 20, 77
        res = np.zeros((h, w, 4), dtype=np.int64)  # a,r,g,b
        res[0, 0] = [(255 - 255) & 0xFF, 100, 0, 0]      # pred (255,0,0,0)
        res[0, 1] = [0, (50 - 100) & 0xFF, 0, 0]          # pred = left
        res[1, 0] = [0, (20 - 100) & 0xFF, 0, 0]          # pred = top(0,0)
        # alpha at (1,1): every candidate predictor of constant-255
        # neighbors is 255 for these modes -> residual 0
        res[1, 1] = [0, (77 - pred_r) & 0xFF, 0, 0]
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(0, 3)  # size_bits = 2: one 4x4 block covers the 2x2 image
        _literal_image_stream(bw, [[(255 << 24) | (mode << 8)]])
        bw.write(0, 1)
        _emit_main_literals(bw, _pack(res))
        got = decode_vp8l(b"\x2f" + bw.done())
        assert np.array_equal(got, want), (mode, got[1, 1], want[1, 1])


class TestColorTransform:
    def test_color_transform_inverse(self):
        """COLOR transform (ttype 1) with g2r=16 (=+0.5 in 3.5 fixed
        point), g2b=240 (=-16 signed = -0.5), r2b=8 (=+0.25):
        r += (g2r·int8(g))>>5, then b += (g2b·int8(g))>>5 +
        (r2b·int8(r))>>5 — r already reconstructed. Residuals built with
        the forward transform from the spec; one hand case asserted:
        g=200 -> int8 = -56; (16·-56)>>5 = -896>>5 = -28 (floor)."""
        assert (16 * -56) >> 5 == -28  # the hand case, spelled out
        h = w = 4
        want = np.zeros((h, w, 4), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                want[y, x, 0] = (40 * x + 10 * y + 3) % 256  # r
                want[y, x, 1] = (200 + 17 * x + 29 * y) % 256  # g (spans ±)
                want[y, x, 2] = (7 * x + 61 * y + 90) % 256  # b
                want[y, x, 3] = 255
        g2r, g2b, r2b = 16, 240, 8  # bytes as stored

        def s8(v):
            return v - 256 if v >= 128 else v

        res = np.zeros((h, w, 4), dtype=np.int64)  # a,r,g,b
        for y in range(h):
            for x in range(w):
                r, g, b = (int(want[y, x, i]) for i in range(3))
                gs = s8(g)
                r_res = (r - ((s8(g2r) * gs) >> 5)) & 0xFF
                rs = s8(r)  # reconstructed red == original (lossless)
                b_res = (b - ((s8(g2b) * gs) >> 5) - ((s8(r2b) * rs) >> 5)) & 0xFF
                res[y, x] = [255, r_res, g, b_res]
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR transform
        bw.write(0, 3)  # size_bits 2 -> one block
        # ColorTransformElement: blue=g2r, green=g2b, red=r2b
        cte = (255 << 24) | (r2b << 16) | (g2b << 8) | g2r
        _literal_image_stream(bw, [[cte]])
        bw.write(0, 1)
        _emit_main_literals(bw, _pack(res))
        got = decode_vp8l(b"\x2f" + bw.done())
        assert np.array_equal(got, want)
        # the hand case: a pixel with g == 200 moved red by exactly -28
        ys, xs = np.nonzero(want[:, :, 1] == 200)
        assert len(ys)  # pattern guarantees one
        y0, x0 = ys[0], xs[0]
        assert (int(res[y0, x0, 1]) - int(want[y0, x0, 0])) % 256 == 28


class TestMetaPrefixGroups:
    def test_two_entropy_groups_by_block(self):
        """8×4 image, meta_bits=2 (4×4 blocks): the meta image routes the
        left block to group 0 and the right to group 1; each group's
        single-symbol codes pin distinct RGBA values, so any routing slip
        changes pixels. Expected image is fully hand-known."""
        w, h = 8, 4
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(1, 1)  # meta prefix image present
        bw.write(0, 3)  # meta_bits = 2 -> 2x1 meta image
        # meta pixel group id lives in (red<<8)|green
        _literal_image_stream(bw, [[(255 << 24) | 0, (255 << 24) | (1 << 8)]])
        g0 = dict(g=10, r=20, b=30, a=255)
        g1 = dict(g=200, r=150, b=99, a=254)
        for grp in (g0, g1):
            _Codes(bw, 256 + 24, {grp["g"]: 1})
            _Codes(bw, 256, {grp["r"]: 1})
            _Codes(bw, 256, {grp["b"]: 1})
            _Codes(bw, 256, {grp["a"]: 1})
            _Codes(bw, 40, {0: 1})
        # single-symbol codes read zero bits: no pixel payload at all
        got = decode_vp8l(b"\x2f" + bw.done())
        want = np.zeros((h, w, 4), dtype=np.uint8)
        want[:, :4] = [g0["r"], g0["g"], g0["b"], g0["a"]]
        want[:, 4:] = [g1["r"], g1["g"], g1["b"], g1["a"]]
        assert np.array_equal(got, want)


# code-length code used by the repeat-op tests: cl symbol 3 -> length 1,
# 16 -> 2, 17 -> 3, 18 -> 3. Canonical (MSB-first): 3=0, 16=10, 17=110,
# 18=111. _CL_ORDER positions: 17@0, 18@1, 3@5, 16@8 -> num_codes 9.
def _write_repeat_cl_header(bw, use_max_symbol, max_symbol=None):
    bw.write(0, 1)  # normal (code-length-coded)
    bw.write(9 - 4, 4)
    for ln in (3, 3, 0, 0, 0, 1, 0, 0, 2):  # order 17,18,0,1,2,3,4,5,16
        bw.write(ln, 3)
    if use_max_symbol:
        bw.write(1, 1)
        bw.write(0, 3)  # length_nbits = 2
        bw.write(max_symbol - 2, 2)
    else:
        bw.write(0, 1)


def _msb(bw, code, n):
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


class TestCodeLengthRepeatOps:
    def test_ops_16_17_18_build_expected_code(self):
        """lengths built as: s0=3; op16 rep3 (s1-3); op17 skip 3; s7=3;
        op18 skip 11; s19=3; s20=3; s21=3; op18 skip 138; op18 skip 96.
        Result: eight length-3 symbols {0,1,2,3,7,19,20,21} — a complete
        code whose canonical MSB assignments are 000..111 in symbol
        order. Decoding hand-picked bit patterns must yield exactly the
        matching symbols."""
        bw = _BitWriter()
        _write_repeat_cl_header(bw, use_max_symbol=False)
        _msb(bw, 0b0, 1)          # cl 3 -> s0
        _msb(bw, 0b10, 2)         # cl 16
        bw.write(0, 2)            # repeat 3+0 -> s1..s3 = 3
        _msb(bw, 0b110, 3)        # cl 17
        bw.write(0, 3)            # skip 3+0 -> s4..s6 = 0
        _msb(bw, 0b0, 1)          # s7 = 3
        _msb(bw, 0b111, 3)        # cl 18
        bw.write(0, 7)            # skip 11+0 -> s8..s18 = 0
        _msb(bw, 0b0, 1)          # s19 = 3
        _msb(bw, 0b0, 1)          # s20 = 3
        _msb(bw, 0b0, 1)          # s21 = 3
        _msb(bw, 0b111, 3)        # cl 18, skip 138
        bw.write(127, 7)
        _msb(bw, 0b111, 3)        # cl 18, skip 11+85=96 -> symbol hits 256
        bw.write(85, 7)
        # payload: canonical codes for {0,1,2,3,7,19,20,21} are 000..111;
        # ask for symbols 19 (101), 0 (000), 21 (111)
        _msb(bw, 0b101, 3)
        _msb(bw, 0b000, 3)
        _msb(bw, 0b111, 3)
        br = _BitReader(bw.done())
        code = _read_prefix_code(br, 256)
        assert [code.read(br) for _ in range(3)] == [19, 0, 21]

    def test_max_symbol_shortcut_bounds_the_read(self):
        """use_max_symbol with max_symbol=3: exactly three ops are read
        (s0=3; op16 rep3 -> s1-3; op16 rep4 -> s4-7), then the loop stops
        with every remaining symbol zero — eight length-3 symbols 0..7,
        canonical codes 000..111 in order."""
        bw = _BitWriter()
        _write_repeat_cl_header(bw, use_max_symbol=True, max_symbol=3)
        _msb(bw, 0b0, 1)          # op1: s0 = 3
        _msb(bw, 0b10, 2)         # op2: cl 16
        bw.write(0, 2)            # repeat 3 -> s1..s3
        _msb(bw, 0b10, 2)         # op3: cl 16
        bw.write(1, 2)            # repeat 4 -> s4..s7
        # payload: symbols 7 (111) then 2 (010)
        _msb(bw, 0b111, 3)
        _msb(bw, 0b010, 3)
        br = _BitReader(bw.done())
        code = _read_prefix_code(br, 256)
        assert [code.read(br) for _ in range(2)] == [7, 2]
