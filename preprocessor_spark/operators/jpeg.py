"""JPEG (ITU-T T.81, Huffman: baseline sequential + progressive) decode —
pure numpy + stdlib, no PIL.

Completes the multimodal decode matrix: PNG/PPM/PGM/BMP/WAV already decode
dependency-free; this closes JPEG, the dominant photographic web format.
Scope: baseline + extended-sequential (SOF0/SOF1) AND progressive (SOF2)
scans, 8-bit samples, grayscale or YCbCr with any sampling factors in {1,2}
(4:4:4, 4:2:2, 4:2:0), restart intervals. Progressive covers the full T.81
Annex G Huffman family — spectral selection, successive approximation, DC/AC
refinement, EOB runs — tested bit-exact against the baseline path via the
progressive encoder below.

Design notes:
- Huffman + bit unpacking is a per-symbol Python loop (entropy decode is
  inherently sequential); everything after — dezigzag, dequantize, the 8x8
  IDCT (one C.T @ blocks @ C einsum over ALL blocks at once), upsample and
  color transform — is vectorized numpy. For corpus-scale feature
  extraction the surrounding mapInPandas batches amortize per-image cost.
- The IDCT uses the orthonormal DCT-II basis matrix, the float reference
  form of Annex A — not a fast integer approximation — so output matches
  the mathematical inverse to rounding.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the stream → (row, col) in the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos((2 * _n + 1) * _k * np.pi / 16)


def build_huffman(bits, vals):
    """Canonical JPEG Huffman table: (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table) -> int:
        length, code = 0, 0
        while True:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 16:
                raise ValueError("invalid JPEG Huffman stream")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n-bit magnitude to signed value."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def _scan_segments(payload: bytes, start: int):
    """Entropy-coded data from ``start``: unstuff FF00, split at RSTn.
    Returns (segments, next_marker_pos)."""
    segs, cur = [], bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 or 4:2:0) — the write path for image re-encode /
# thumbnail export. Uses flat custom canonical Huffman tables (all DC
# categories at 4 bits, all 162 AC symbols at 8 bits — both leave the
# all-ones code unused as T.81 requires); decoders read tables from DHT, so
# interop holds with any compliant reader.
# ---------------------------------------------------------------------------

DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
AC_BITS = [0] * 7 + [len(AC_VALS)] + [0] * 8


def _encode_codes(bits, vals):
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


_DC_CODE = _encode_codes(DC_BITS, DC_VALS)
_AC_CODE = _encode_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)


def _category(v: int) -> int:
    n = 0
    a = abs(v)
    while a:
        a >>= 1
        n += 1
    return n


def _put(bw: _BitWriter, table, sym: int, v: int, n: int) -> None:
    length, code = table[sym]
    bw.put(code, length)
    if n:
        bw.put(v if v >= 0 else v + (1 << n) - 1, n)


def _encode_block(bw: _BitWriter, b, pred: int) -> int:
    diff = int(b[0]) - pred
    n = _category(diff)
    _put(bw, _DC_CODE, n, diff, n)
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
            _put(bw, _AC_CODE, 0xF0, 0, 0)
            run -= 16
        n = _category(v)
        _put(bw, _AC_CODE, (run << 4) | n, v, n)
        run = 0
    if last < 63:
        _put(bw, _AC_CODE, 0x00, 0, 0)
    return int(b[0])


def _plane_to_zigzag_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), forward DCT, quantize →
    (by, bx, 64) int64 coefficients in zigzag stream order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64) - 128.0
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("kn,bcnm,ml->bckl", _C, blocks, _C.T)
    return np.round(coefs.reshape(by, bx, 64)[:, :, ZIGZAG] / q).astype(np.int64)


def encode_jpeg(img: np.ndarray, qval: int = 2, subsample: bool = False, restart: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes.

    ``qval`` is a uniform quantizer step (1 ≈ visually lossless, 8 coarse);
    ``subsample=True`` writes 4:2:0 (2x2-mean chroma); ``restart`` inserts a
    restart marker every N MCUs. Round-trips with :func:`decode_jpeg` and
    any T.81 reader."""
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
        grids.append(_plane_to_zigzag_blocks(pp, qtab))

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
                        preds[ci] = _encode_block(bw, grids[ci][my * sv + by, mx * sh + bx], preds[ci])
            mcu += 1
    bw.flush()
    data += bw.out

    def seg(marker: int, body: bytes) -> bytes:
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


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline (SOF0/SOF1) or progressive (SOF2) JPEG → float32
    grayscale [0,1] (mean of RGB for color images, matching the other
    decoders' convention). Progressive support covers the full T.81 Annex G
    Huffman scan family: spectral selection, successive approximation, DC
    and AC refinement passes, EOB runs, interleaved DC / non-interleaved AC
    geometry, restart intervals per scan."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = None
    restart_interval = 0
    progressive = False
    scans = []  # (order, Ss, Se, Ah, Al, segs, dri)
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if prec:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                qt[tid] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            progressive = marker == 0xC2
            _prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = build_huffman(bits, vals)
                j += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            order = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                order.append((cs, tables >> 4, tables & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            segs, i = _scan_segments(payload, i + 2 + ln)
            scans.append(
                (order, ss, se, ahal >> 4, ahal & 0xF, segs, restart_interval)
            )
            # snapshot the huffman tables this scan referenced (later DHTs
            # may overwrite the slot ids between scans)
            order2 = [
                (cs, dict(huff_dc.get(d, {})), dict(huff_ac.get(a, {})))
                for cs, d, a in order
            ]
            scans[-1] = (order2, ss, se, ahal >> 4, ahal & 0xF, segs, restart_interval)
            continue  # i already advanced to the marker after the scan
        i += 2 + ln
    if comps is None or not scans:
        raise ValueError("JPEG without SOF/SOS")

    if progressive:
        return _decode_progressive(payload, comps, qt, scans, h, w)

    order2, _ss, _se, _ah, _al, segs, restart_interval = scans[0]
    scan_tables = {cs: (d, a) for cs, d, a in order2}
    order = [cs for cs, _d, _a in order2]
    comp_by_id = {cid: (hh, vv, tq) for cid, hh, vv, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    # per-component quantized-coefficient block grids
    planes = {}
    for cid, hh, vv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vv, mcus_x * hh, 64), dtype=np.int32)

    mcu_index = 0
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                preds = {cid: 0 for cid, *_ in comps}
            for cs in order:
                dct, act = scan_tables[cs]
                hh, vv, _tq = comp_by_id[cs]
                for by in range(vv):
                    for bx in range(hh):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = reader.decode(dct)
                        diff = _extend(reader.receive(t), t)
                        preds[cs] += diff
                        coeffs[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        planes[cs][my * vv + by, mx * hh + bx] = coeffs
            mcu_index += 1

    return _reconstruct(planes, comps, qt, h, w, max_h, max_v)


def _reconstruct(planes, comps, qt, h, w, max_h, max_v) -> np.ndarray:
    """Quantized-coefficient block grids → pixels: dequantize → dezigzag →
    one einsum IDCT over every block at once → upsample → crop → gray."""
    out_planes = {}
    for cid, hh, vv, tq in comps:
        grid = planes[cid]
        by, bx = grid.shape[0], grid.shape[1]
        deq = grid.reshape(-1, 64) * qt[tq][None, :]
        blocks = np.zeros((deq.shape[0], 64), dtype=np.float64)
        blocks[:, ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("kn,bkl,lm->bnm", _C, blocks, _C) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        plane = np.repeat(np.repeat(plane, max_v // vv, axis=0), max_h // hh, axis=1)
        out_planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        gray = out_planes[comps[0][0]]
        return np.clip(gray, 0, 255).astype(np.float32) / 255.0
    y, cb, cr = (out_planes[c[0]] for c in comps[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    return rgb.astype(np.float32).mean(axis=2) / 255.0


def _decode_progressive(payload, comps, qt, scans, h, w) -> np.ndarray:
    """T.81 Annex G progressive Huffman decoding: every scan deposits or
    refines quantized coefficients in per-component grids; reconstruction
    happens once at the end. DC scans may interleave all components (MCU
    geometry); AC scans are single-component over that component's OWN
    ceil(dim/8) block grid — padding blocks beyond it exist only in the
    grids and stay at whatever the DC scan put there (they are cropped
    away after the IDCT)."""
    comp_by_id = {cid: (hh, vv, tq) for cid, hh, vv, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = {
        cid: np.zeros((mcus_y * vv, mcus_x * hh, 64), dtype=np.int32)
        for cid, hh, vv, _tq in comps
    }
    # non-interleaved geometry (T.81 A.1.1): component dims are
    # xi = ceil(w·hi/hmax), yi = ceil(h·vi/vmax); blocks cover ceil(dim/8)
    nonint = {}
    for cid, hh, vv, _tq in comps:
        yi = -(-(h * vv) // max_v)
        xi = -(-(w * hh) // max_h)
        nonint[cid] = (-(-yi // 8), -(-xi // 8))

    for order, ss, se, ah, al, segs, dri in scans:
        seg_iter = iter(segs)
        reader = _BitReader(next(seg_iter))
        if ss == 0:  # ---- DC scan (Se must be 0) ----
            preds = {cs: 0 for cs, _d, _a in order}
            unit = 0
            if len(order) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if dri and unit and unit % dri == 0:
                            reader = _BitReader(next(seg_iter))
                            preds = {cs: 0 for cs, _d, _a in order}
                        for cs, dct, _act in order:
                            hh, vv, _tq = comp_by_id[cs]
                            for by in range(vv):
                                for bx in range(hh):
                                    blk = planes[cs][my * vv + by, mx * hh + bx]
                                    if ah == 0:
                                        t = reader.decode(dct)
                                        preds[cs] += _extend(reader.receive(t), t)
                                        blk[0] = preds[cs] << al
                                    else:
                                        if reader.read_bit():
                                            blk[0] |= 1 << al
                        unit += 1
            else:
                cs, dct, _act = order[0]
                bh, bw = nonint[cs]
                for by in range(bh):
                    for bx in range(bw):
                        if dri and unit and unit % dri == 0:
                            reader = _BitReader(next(seg_iter))
                            preds = {cs: 0}
                        blk = planes[cs][by, bx]
                        if ah == 0:
                            t = reader.decode(dct)
                            preds[cs] += _extend(reader.receive(t), t)
                            blk[0] = preds[cs] << al
                        else:
                            if reader.read_bit():
                                blk[0] |= 1 << al
                        unit += 1
            continue

        # ---- AC scan: exactly one component (T.81 G.1.1.1) ----
        if len(order) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        cs, _dct, act = order[0]
        bh, bw = nonint[cs]
        eobrun = 0
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and unit and unit % dri == 0:
                    reader = _BitReader(next(seg_iter))
                    eobrun = 0
                blk = planes[cs][by, bx]
                if ah == 0:
                    # first pass for this band/bit
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += reader.receive(r)
                                    break
                                k += 16  # ZRL
                                continue
                            k += r
                            blk[k] = _extend(reader.receive(s), s) << al
                            k += 1
                else:
                    # refinement pass (G.2): correction bits ride along runs
                    bit = 1 << al
                    k = ss
                    if eobrun > 0:
                        eobrun -= 1
                        while k <= se:
                            if blk[k] != 0 and reader.read_bit():
                                if not (abs(blk[k]) & bit):
                                    blk[k] += bit if blk[k] > 0 else -bit
                            k += 1
                    else:
                        while k <= se:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0xF
                            val = 0
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += reader.receive(r)
                                    # fall through: apply corrections to the
                                    # rest of the band, then consume one EOB
                                    while k <= se:
                                        if blk[k] != 0 and reader.read_bit():
                                            if not (abs(blk[k]) & bit):
                                                blk[k] += bit if blk[k] > 0 else -bit
                                        k += 1
                                    eobrun -= 1
                                    break
                                # ZRL (r=15, s=0): 15 decrements + the
                                # terminal r==0 consume = 16 zero-history
                                # positions skipped, corrections applied to
                                # nonzeros along the way
                            else:
                                val = bit if reader.read_bit() else -bit
                            while k <= se:
                                if blk[k] != 0:
                                    if reader.read_bit():
                                        if not (abs(blk[k]) & bit):
                                            blk[k] += bit if blk[k] > 0 else -bit
                                else:
                                    if r == 0:
                                        if val:
                                            blk[k] = val
                                        k += 1
                                        break
                                    r -= 1
                                k += 1
                unit += 1

    return _reconstruct(planes, comps, qt, h, w, max_h, max_v)


def encode_jpeg_progressive(
    img: np.ndarray, qval: int = 2, subsample: bool = False, al: int = 1
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → PROGRESSIVE (SOF2) JFIF bytes.

    Scan script exercises every Annex G Huffman scan type:
      1. DC first, interleaved, successive approximation Al=``al``;
      2. per-component AC first, full band 1–63 at Al=``al``
         (non-interleaved, the component's own block geometry);
      3. DC refinement passes down to Al=0 (one bit per block);
      4. per-component AC refinement passes down to Al=0 (correction bits
         + newly-significant insertions, EOB carrying trailing bits).
    Coefficients are transmitted losslessly across the passes, so decoding
    this stream is BIT-IDENTICAL to decoding the baseline encoding of the
    same image at the same ``qval`` — which is what the tests assert.
    ``al=0`` degenerates to spectral-selection-only (no refinement scans).
    """
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
    nonint = []
    for p, (sh, sv) in zip(planes, samp):
        gh, gw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.pad(p, ((0, gh - p.shape[0]), (0, gw - p.shape[1])), mode="edge")
        grids.append(_plane_to_zigzag_blocks(pp, qtab))
        yi = -(-(h * sv) // max_v)
        xi = -(-(w * sh) // max_h)
        nonint.append((-(-yi // 8), -(-xi // 8)))

    body = bytearray()

    def sos_header(comp_ids, ss, se, ah, a_l):
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | a_l])
        return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # 1. DC first, interleaved, Al=al
    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(grids[ci][my * sv + by, mx * sh + bx][0]) >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        n = _category(diff)
                        _put(bw, _DC_CODE, n, diff, n)
    bw.flush()
    body += sos_header(list(range(len(planes))), 0, 0, 0, al) + bw.out

    # 2. AC first per component, band 1..63, Al=al
    for ci in range(len(planes)):
        bw = _BitWriter()
        bh, bwid = nonint[ci]
        for by in range(bh):
            for bx in range(bwid):
                blk = grids[ci][by, bx]
                run = 0
                last = 63
                while last > 0 and (abs(int(blk[last])) >> al) == 0:
                    last -= 1
                for k in range(1, last + 1):
                    v = int(blk[k])
                    cp = (abs(v) >> al) * (1 if v > 0 else -1)
                    if cp == 0:
                        run += 1
                        continue
                    while run > 15:
                        _put(bw, _AC_CODE, 0xF0, 0, 0)
                        run -= 16
                    n = _category(cp)
                    _put(bw, _AC_CODE, (run << 4) | n, cp, n)
                    run = 0
                if last < 63 or last == 0:
                    _put(bw, _AC_CODE, 0x00, 0, 0)  # EOB (run length 1)
        bw.flush()
        body += sos_header([ci], 1, 63, 0, al) + bw.out

    # 3./4. refinement passes al-1 .. 0
    for a in range(al - 1, -1, -1):
        ah = a + 1
        # DC refinement: one raw bit per block, interleaved
        bw = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            bw.put((int(grids[ci][my * sv + by, mx * sh + bx][0]) >> a) & 1, 1)
        bw.flush()
        body += sos_header(list(range(len(planes))), 0, 0, ah, a) + bw.out

        # AC refinement per component
        for ci in range(len(planes)):
            bw = _BitWriter()
            bh, bwid = nonint[ci]
            for by in range(bh):
                for bx in range(bwid):
                    blk = grids[ci][by, bx]
                    run = 0
                    pending: list[int] = []
                    emitted_any = False
                    for k in range(1, 64):
                        v = int(blk[k])
                        mag = abs(v)
                        if (mag >> ah) != 0:
                            pending.append((mag >> a) & 1)
                        elif (mag >> a) != 0:  # newly significant (== 1)
                            while run > 15:
                                _put(bw, _AC_CODE, 0xF0, 0, 0)
                                for bit in pending:
                                    bw.put(bit, 1)
                                pending = []
                                run -= 16
                            _put(bw, _AC_CODE, (run << 4) | 1, 0, 0)
                            bw.put(1 if v > 0 else 0, 1)  # sign: 1 = positive
                            for bit in pending:
                                bw.put(bit, 1)
                            pending = []
                            run = 0
                            emitted_any = True
                        else:
                            run += 1
                    if run > 0 or pending or not emitted_any:
                        _put(bw, _AC_CODE, 0x00, 0, 0)  # EOB
                        for bit in pending:
                            bw.put(bit, 1)
            bw.flush()
            body += sos_header([ci], 1, 63, ah, a) + bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(qtab.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += bytes(body)
    out += b"\xff\xd9"
    return out
