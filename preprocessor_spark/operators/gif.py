"""GIF87a/89a decode — pure numpy + stdlib, no PIL.

Extends the dependency-free decode matrix (PNG/JPEG incl. progressive/
PPM/PGM/BMP/WAV) with the web's animation workhorse. Scope:

- LZW decompression (variable code width 3→12 bits, clear/EOI codes,
  per-spec dictionary growth) — the whole format is this plus framing;
- global and local color tables, interlaced rasters (the 8/8/4/2 row
  passes), transparency via Graphic Control Extension;
- ANIMATION: every image descriptor is a frame; frames composite onto the
  running canvas honoring disposal methods 0/1 (keep) and 2 (restore to
  background). ``decode_gif_frames`` yields the composited frames —
  the GIF twin of the MJPEG-AVI frame sampler.

The test-side encoder emits valid streams the simple way — literal codes
with a clear code before each width overflow (pure "uncompressed LZW",
exactly how many tools write small GIFs) — so decode is pixel-exact
tested against planted rasters without any imaging library.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> list[int]:
    """GIF-flavor LZW: returns ``expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []

    def reset():
        return {i: [i] for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = eoi + 1
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width = reset()
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out[:expected]
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + [entry[0]]
                    next_code += 1
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                if next_code < 4096:
                    table[next_code] = entry
                    next_code += 1
            out.extend(entry)
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return out[:expected]
    return out[:expected]


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out[rows] = idx
    return out


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """All composited frames as float32 grayscale [0,1] arrays (palette RGB
    averaged), honoring disposal 0/1 (leave), 2 (restore background), and
    3 (restore to previous — region snapshot taken before drawing)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_index, _ar = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.float64)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0

    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i + 1]
            i += 2
            if label == 0xF9:  # graphic control
                sz = payload[i]
                gflags = payload[i + 1]
                disposal = (gflags >> 2) & 0x7
                transparent = payload[i + 4] if gflags & 1 else None
                i += sz + 1
            while payload[i] != 0:  # skip (remaining) sub-blocks
                i += payload[i] + 1
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh, lflags = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
        i += 10
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 0x07)
            ct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if ct is None:
            raise ValueError("GIF frame without color table")
        min_code = payload[i]
        i += 1
        data = bytearray()
        while payload[i] != 0:
            ln = payload[i]
            data += payload[i + 1 : i + 1 + ln]
            i += ln + 1
        i += 1
        idx = np.array(
            _lzw_decode(min_code, bytes(data), fw * fh), dtype=np.int64
        ).reshape(fh, fw)
        if lflags & 0x40:
            idx = _deinterlace(idx)
        # disposal 3 (restore-to-previous): the region reverts to its
        # pre-draw contents once this frame has been displayed
        prev_region = canvas[fy : fy + fh, fx : fx + fw].copy() if disposal == 3 else None
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = ct[np.clip(idx, 0, len(ct) - 1)].astype(np.float64)
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append((canvas.mean(axis=2) / 255.0).astype(np.float32))
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = (
                gct[bg_index] if gct is not None and bg_index < len(gct) else 0
            )
        elif disposal == 3:
            canvas[fy : fy + fh, fx : fx + fw] = prev_region
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF without image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame only — the still-image entry point `decode_image` uses."""
    return decode_gif_frames(payload)[0]


def encode_gif(
    frames: list[np.ndarray] | np.ndarray, palette: np.ndarray | None = None
) -> bytes:
    """Planted-test GIF writer: (h, w) uint8 index rasters (single frame or
    list) + an (n, 3) palette → GIF89a bytes using literal LZW codes with a
    clear code before every dictionary overflow. Valid per spec (decoders
    must honor mid-stream clears), just uncompressed."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if palette is None:
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    n = len(palette)
    depth = max(2, int(np.ceil(np.log2(n))) or 1)
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[:n] = palette
    h, w = frames[0].shape

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    min_code = depth
    clear, eoi = 1 << depth, (1 << depth) + 1
    for fr in frames:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        acc, nbits = 0, 0
        body = bytearray()

        def put(code: int, width: int):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                body.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        width = min_code + 1
        put(clear, width)
        count = eoi + 1  # decoder's next_code after the clear
        for v in fr.astype(np.int64).ravel():
            put(int(v), width)
            count += 1  # decoder grows its table once per literal
            if count == (1 << width) - 1:
                # stay ahead of the width bump: clear resets both sides
                put(clear, width)
                width = min_code + 1
                count = eoi + 1
        put(eoi, width)
        if nbits:
            body.append(acc & 0xFF)
        for j in range(0, len(body), 255):
            chunk = body[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
