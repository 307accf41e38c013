"""Pure-Python WebP **lossless** (VP8L) codec — closes the last common
crawled-image format without pixel decode.

Implements the public "WebP Lossless Bitstream Specification"
(developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
from scratch: LSB-first bitreader, simple + normal (code-length-coded)
prefix codes incl. the 16/17/18 repeat ops and the max_symbol shortcut,
meta-prefix groups via an entropy image, the 32-entry..2048-entry color
cache, LZ77 backward references with the 120-code close-neighborhood
distance map, and all four inverse transforms (PREDICTOR's 14 modes,
COLOR, SUBTRACT_GREEN, COLOR_INDEXING incl. sub-byte pixel bundling).

Lossy WebP (VP8 chunk) remains a declared codec gate — it is a full
intra-frame video codec (boolean arithmetic coder, DCT, loop filter) and
belongs to ffmpeg/libwebp, same policy as inter-frame video in
:mod:`preprocessor_spark.operators.multimodal`.

The encoder (:func:`encode_webp_lossless`) emits a minimal valid stream —
no transforms, no color cache, one prefix-code group, literals only —
used by the planted bit-exact round-trip tests (the same
encoder-built-fixture discipline as tests/test_jpeg.py). Decode speed is
secondary by design: this is the compatibility path a metadata-first
pipeline hits only after header filters (operators/media_meta.py) say a
payload is worth decoding.
"""

from __future__ import annotations

import struct

import numpy as np

# kCodeLengthCodeOrder from the spec §5.2.2
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# close-neighborhood distance map, spec §4.2.2: codes 1..120 -> (dx, dy)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code: decode one symbol by bitwise tree walk.

    ``lengths[sym]`` are canonical (DEFLATE-style: codes assigned in
    (length, symbol) order, numerically increasing, MSB first); bits come
    off the LSB-first reader one at a time."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        # kraft check + canonical assignment
        code = 0
        table: dict[tuple[int, int], int] = {}
        prev_len = 0
        for l, s in sorted(nz):
            code <<= l - prev_len
            table[(l, code)] = s
            code += 1
            prev_len = l
        if code != (1 << prev_len):
            raise ValueError("prefix code is not complete")
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.table is None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            if length > 15:
                raise ValueError("prefix code read overflow")
            s = self.table.get((length, code))
            if s is not None:
                return s


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 == sym0:
                raise ValueError("duplicate symbol in simple prefix code")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # single-symbol: zero bits consumed on read
            return _SinglePrefix(sym0)
        return _Prefix(lengths)
    # normal: code lengths are themselves prefix-coded
    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    n_cl = sum(1 for l in cl_lengths if l)
    if n_cl == 0:
        raise ValueError("empty code-length code in prefix header")
    cl = _Prefix(cl_lengths) if n_cl > 1 else _SinglePrefix(
        next(s for s, l in enumerate(cl_lengths) if l)
    )
    if br.read(1):  # use max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = br.read(2) + 3
            lengths[symbol : symbol + rep] = [prev_len] * min(
                rep, alphabet_size - symbol
            )
            symbol += rep
        elif code_len == 17:
            symbol += br.read(3) + 3
        else:  # 18
            symbol += br.read(7) + 11
    return _Prefix(lengths)


class _SinglePrefix:
    """Degenerate one-symbol code: consumes no bits."""

    __slots__ = ("sym",)

    def __init__(self, sym: int):
        self.sym = sym

    def read(self, br: _BitReader) -> int:
        return self.sym


def _lz77_extent(br: _BitReader, sym: int) -> int:
    """Prefix-coded length/distance value (spec §4.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_image_stream(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """Returns an h×w uint32 ARGB array."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen or len(seen) == 4:
                raise ValueError("repeated VP8L transform")
            seen.add(ttype)
            transforms.append(_read_transform(br, ttype, w, h))
            if ttype == 3:  # color indexing changes the coded width
                w = transforms[-1][3]

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"VP8L color cache bits {cache_bits} out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_stream(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [
        tuple(_read_prefix_code(br, a) for a in alphabets)
        for _ in range(num_groups)
    ]

    out = np.zeros(w * h, dtype=np.uint32)
    ins = 0x1E35A7BD
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    total = w * h
    g = groups[0]
    last_meta_key = -1
    while pos < total:
        if meta is not None:
            x = pos % w
            y = pos // w
            key = (y >> meta_bits) * meta.shape[1] + (x >> meta_bits)
            if key != last_meta_key:
                g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
                last_meta_key = key
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[((ins * px) & 0xFFFFFFFF) >> shift] = px
            pos += 1
        elif s < 256 + 24:
            length = _lz77_extent(br, s - 256)
            dsym = g[4].read(br)
            dcode = _lz77_extent(br, dsym)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_bits:
                    cache[((ins * px) & 0xFFFFFFFF) >> shift] = px
                pos += 1
        else:
            out[pos] = cache[s - 256 - 24]
            pos += 1

    img = out.reshape(h, w)
    for t in reversed(transforms):
        img = _apply_inverse_transform(img, t)
    return img


def _read_transform(br: _BitReader, ttype: int, w: int, h: int):
    if ttype == 2:  # SUBTRACT_GREEN — no payload
        return (2, None, None, w)
    if ttype in (0, 1):  # PREDICTOR / COLOR: per-block sub-image
        size_bits = br.read(3) + 2
        bw = (w + (1 << size_bits) - 1) >> size_bits
        bh = (h + (1 << size_bits) - 1) >> size_bits
        sub = _decode_image_stream(br, bw, bh, False)
        return (ttype, size_bits, sub, w)
    # COLOR_INDEXING: palette + pixel bundling
    n_colors = br.read(8) + 1
    palette = _decode_image_stream(br, n_colors, 1, False)[0]
    # palette entries are delta-coded component-wise
    pal = palette.copy()
    for i in range(1, n_colors):
        a = (pal[i - 1] >> 24) + (pal[i] >> 24)
        r = ((pal[i - 1] >> 16) & 0xFF) + ((pal[i] >> 16) & 0xFF)
        g = ((pal[i - 1] >> 8) & 0xFF) + ((pal[i] >> 8) & 0xFF)
        b = (pal[i - 1] & 0xFF) + (pal[i] & 0xFF)
        pal[i] = (
            ((int(a) & 0xFF) << 24)
            | ((int(r) & 0xFF) << 16)
            | ((int(g) & 0xFF) << 8)
            | (int(b) & 0xFF)
        )
    if n_colors > 16:
        width_bits = 0
    elif n_colors > 4:
        width_bits = 1
    elif n_colors > 2:
        width_bits = 2
    else:
        width_bits = 3
    packed_w = (w + (1 << width_bits) - 1) >> width_bits
    return (3, (pal, width_bits, w), None, packed_w)


def _apply_inverse_transform(img: np.ndarray, t) -> np.ndarray:
    ttype = t[0]
    if ttype == 2:  # add green to red and blue
        g = (img >> 8) & 0xFF
        r = (((img >> 16) & 0xFF) + g) & 0xFF
        b = ((img & 0xFF) + g) & 0xFF
        return (img & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
    if ttype == 3:  # color indexing: unbundle + palette lookup
        pal, width_bits, true_w = t[1]
        h, pw = img.shape
        idx = (img >> 8) & 0xFF
        if width_bits == 0:
            flat = idx
        else:
            per = 1 << width_bits
            bits = 8 >> width_bits
            cols = []
            for i in range(per):
                cols.append((idx >> (i * bits)) & ((1 << bits) - 1))
            flat = np.stack(cols, axis=2).reshape(h, pw * per)[:, :true_w]
        flat = np.clip(flat, 0, len(pal) - 1)
        return pal[flat.astype(np.int64)]
    if ttype == 1:  # color transform
        size_bits, sub = t[1], t[2]
        h, w = img.shape
        by = np.arange(h) >> size_bits
        bx = np.arange(w) >> size_bits
        cte = sub[np.ix_(by, bx)]
        # ColorTransformElement packing (libwebp ColorCodeToMultipliers):
        # blue channel = green_to_red, green = green_to_blue,
        # red = red_to_blue — all signed 3.5 fixed-point int8
        g2r = _i8(cte & 0xFF)
        g2b = _i8((cte >> 8) & 0xFF)
        r2b = _i8((cte >> 16) & 0xFF)
        a = (img >> 24) & 0xFF
        r = ((img >> 16) & 0xFF).astype(np.int64)
        g = ((img >> 8) & 0xFF).astype(np.int64)
        b = (img & 0xFF).astype(np.int64)
        gs = _i8s(g)
        r = (r + ((g2r * gs) >> 5)) & 0xFF
        rs = _i8s(r)
        b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
        return (
            (a.astype(np.uint32) << np.uint32(24))
            | (r.astype(np.uint32) << np.uint32(16))
            | (g.astype(np.uint32) << np.uint32(8))
            | b.astype(np.uint32)
        )
    # PREDICTOR — sequential by definition (left/top dependencies)
    size_bits, sub = t[1], t[2]
    h, w = img.shape
    a8 = ((img >> 24) & 0xFF).astype(np.int64)
    r8 = ((img >> 16) & 0xFF).astype(np.int64)
    g8 = ((img >> 8) & 0xFF).astype(np.int64)
    b8 = (img & 0xFF).astype(np.int64)
    chans = np.stack([a8, r8, g8, b8], axis=2)  # residuals
    out = np.zeros_like(chans)
    modes = ((sub >> 8) & 0xFF).astype(np.int64)

    def avg2(p, q):
        return (p + q) >> 1

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # libwebp semantics: the "top-right" of the last column
                # aliases the first pixel of the CURRENT row (rows are
                # contiguous in its buffer, so top_row[w] == row[0])
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0])
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:  # Select
                    p = L + T - TL
                    pl = np.abs(p - L).sum()
                    pt = np.abs(p - T).sum()
                    pred = L if pl < pt else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # ClampAddSubtractHalf
                    ave = avg2(L, T)
                    d = ave - TL
                    # C's (a - b) / 2 truncates toward zero, not floor
                    pred = np.clip(
                        ave + np.sign(d) * (np.abs(d) // 2), 0, 255
                    )
                else:
                    raise ValueError(f"VP8L predictor mode {mode} invalid")
            out[y, x] = (chans[y, x] + pred) & 0xFF
    return (
        (out[:, :, 0].astype(np.uint32) << np.uint32(24))
        | (out[:, :, 1].astype(np.uint32) << np.uint32(16))
        | (out[:, :, 2].astype(np.uint32) << np.uint32(8))
        | out[:, :, 3].astype(np.uint32)
    )


def _i8(v: np.ndarray) -> np.ndarray:
    """uint8 array -> signed int8 semantics in int64."""
    v = v.astype(np.int64)
    return np.where(v >= 128, v - 256, v)


def _i8s(v: np.ndarray) -> np.ndarray:
    """color-transform delta uses the value reinterpreted as signed."""
    return np.where(v >= 128, v - 256, v)


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload → h×w×4 uint8 RGBA array."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L version {version} unsupported")
    argb = _decode_image_stream(br, w, h, True)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = (argb >> 16) & 0xFF
    out[:, :, 1] = (argb >> 8) & 0xFF
    out[:, :, 2] = argb & 0xFF
    out[:, :, 3] = (argb >> 24) & 0xFF
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF WebP container → float32 grayscale [0,1] (the decode_image
    contract). Lossless (VP8L) decodes here, including inside a VP8X
    extended container; lossy (VP8) raises the declared codec gate."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    vp8l = None
    saw_lossy = False
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if vp8l is None:
        if saw_lossy:
            raise NotImplementedError(
                "lossy WebP (VP8) requires a video-codec library (libwebp/"
                "ffmpeg) — only lossless VP8L decodes in pure Python"
            )
        raise ValueError("WebP container without VP8L/VP8 image chunk")
    rgba = decode_vp8l(vp8l)
    # Rec.601 luma, same weights as the other decoders in multimodal.py
    r = rgba[:, :, 0].astype(np.float32)
    g = rgba[:, :, 1].astype(np.float32)
    b = rgba[:, :, 2].astype(np.float32)
    return (0.299 * r + 0.587 * g + 0.114 * b) / 255.0


# ------------------------------------------------------------------ encoder


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _huff_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Depth-limited Huffman code lengths (package-merge would be exact;
    the rebalance loop below is the standard zlib-style fixup and always
    yields a complete canonical code)."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    if not syms:
        raise ValueError("empty histogram")
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    import heapq

    heap = [(freqs[s], s, ("leaf", s)) for s in syms]
    heapq.heapify(heap)
    cnt = len(freqs)
    while len(heap) > 1:
        f1, _, t1 = heapq.heappop(heap)
        f2, _, t2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, cnt, ("node", t1, t2)))
        cnt += 1
    lengths = [0] * len(freqs)

    def walk(t, d):
        if t[0] == "leaf":
            lengths[t[1]] = max(d, 1)
        else:
            walk(t[1], d + 1)
            walk(t[2], d + 1)

    walk(heap[0][2], 0)
    # depth-limit fixup
    while max(lengths) > max_len:
        over = max(
            (s for s in range(len(lengths)) if lengths[s] > max_len),
            key=lambda s: lengths[s],
        )
        donor = min(
            (s for s in range(len(lengths)) if 0 < lengths[s] < max_len),
            key=lambda s: lengths[s],
        )
        lengths[over] = max_len
        lengths[donor] += 1
        # re-normalize Kraft by shortening where possible
        while sum(2.0 ** -l for l in lengths if l) > 1.0:
            worst = max(
                (s for s in range(len(lengths)) if lengths[s]),
                key=lambda s: lengths[s],
            )
            lengths[worst] += 1
            if lengths[worst] > max_len:
                lengths[worst] = max_len
                break
    # make the code exactly complete: repeatedly shorten the deepest
    # symbol while Kraft < 1
    def kraft():
        return sum(2.0 ** -l for l in lengths if l)

    while kraft() < 1.0:
        deepest = max(
            (s for s in range(len(lengths)) if lengths[s]),
            key=lambda s: lengths[s],
        )
        lengths[deepest] -= 1
    if kraft() != 1.0:
        raise ValueError("failed to build a complete prefix code")
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = [(l, s) for s, l in enumerate(lengths) if l]
    if len(nz) == 1:
        # single-symbol codes consume ZERO bits on read (decoder never
        # touches the stream) — emit zero bits symmetrically
        return {nz[0][1]: (0, 0)}
    code = 0
    prev = 0
    out = {}
    for l, s in sorted(nz):
        code <<= l - prev
        out[s] = (code, l)
        code += 1
        prev = l
    return out


def _write_msb_code(bw: _BitWriter, code: int, length: int):
    """Prefix codes are read MSB-first bit by bit off the LSB-first
    stream, so write the bits in MSB→LSB order."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_prefix_code(bw: _BitWriter, lengths: list[int]):
    nz = [(s, l) for s, l in enumerate(lengths) if l]
    if len(nz) <= 2 and all(s < 256 for s, _ in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0][0]
        if s0 > 1:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write(0, 1)  # normal
    # code-length code: flat 5-bit-capable lengths for whatever CL symbols
    # we use (0..15 only — the encoder never emits 16/17/18)
    cl_freq = [0] * 19
    for _, l in ((s, lengths[s]) for s in range(len(lengths))):
        cl_freq[l] += 1
    cl_lengths = _huff_lengths(cl_freq, max_len=7)
    # order and count
    order_pos = {c: i for i, c in enumerate(_CL_ORDER)}
    num_codes = max(order_pos[c] for c in range(19) if cl_lengths[c]) + 1
    num_codes = max(num_codes, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut: emit every length
    cl_codes = _canonical_codes(cl_lengths)
    for l in lengths:
        c, n = cl_codes[l]
        _write_msb_code(bw, c, n)


def encode_webp_lossless(rgba: np.ndarray) -> bytes:
    """h×w×4 uint8 RGBA → a minimal valid lossless WebP file (no
    transforms, no color cache, one prefix-code group, literals only)."""
    if rgba.ndim == 2:  # grayscale convenience
        g = rgba.astype(np.uint8)
        rgba = np.stack([g, g, g, np.full_like(g, 255)], axis=2)
    h, w = rgba.shape[:2]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (rgba[:, :, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    r = rgba[:, :, 0].ravel()
    g = rgba[:, :, 1].ravel()
    b = rgba[:, :, 2].ravel()
    a = rgba[:, :, 3].ravel()
    planes = [g, r, b, a]  # literal order: green, red, blue, alpha
    alphabet = [256 + 24, 256, 256, 256, 40]
    all_lengths = []
    for i, al in enumerate(alphabet):
        freq = [0] * al
        if i < 4:
            vals, counts = np.unique(planes[i], return_counts=True)
            for v, c in zip(vals, counts):
                freq[int(v)] = int(c)
        else:
            freq[0] = 1  # unused distance code still needs one symbol
        all_lengths.append(_huff_lengths(freq))
        _write_prefix_code(bw, all_lengths[-1])
    codes = [_canonical_codes(l) for l in all_lengths]
    gl = np.stack(planes, axis=1)
    for row in gl:
        for chan in range(4):
            c, n = codes[chan][int(row[chan])]
            if n:
                _write_msb_code(bw, c, n)
    vp8l = b"\x2f" + bw.done()
    if len(vp8l) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
