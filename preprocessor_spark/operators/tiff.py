"""Baseline TIFF 6.0 decode — pure numpy + stdlib, no PIL.

Rounds out the dependency-free raster matrix (PNG/JPEG incl. progressive/
GIF/PPM/PGM/BMP). Scope: both byte orders (II/MM), IFD tag walk, 8-
and 16-bit grayscale (both photometric polarities) / RGB / RGBA, multiple strips,
Compression 1 (none), 5 (LZW with early-change), 8/32946 (deflate via
stdlib zlib), and 32773 (PackBits RLE) — all composable with the
horizontal-differencing predictor — PlanarConfiguration 1 (chunky); plus
JPEG-in-TIFF: new-style compression 7 strips (with JPEGTables tag 347
merge) and old-style compression 6 in its interchange form (tag 513/514),
both routed through the repo's own T.81 decoder (``operators/jpeg.py``).
Tiled and planar variants raise a clear ``NotImplementedError`` naming the
missing piece — scientific TIFF zoos are endless; this covers the
scanner/export profile actually seen in web corpora.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd_value(data: bytes, endian: str, ttype: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(ttype, 1) * count
    if size > 4:
        (off,) = struct.unpack(endian + "I", raw)
        buf = data[off : off + size]
    else:
        buf = raw[:size]
    if ttype in (3,):
        return list(struct.unpack(endian + "H" * count, buf))
    if ttype in (4,):
        return list(struct.unpack(endian + "I" * count, buf))
    if ttype in (1, 6, 7):
        return list(buf)
    return list(buf)


def _lzw_decode_tiff(src: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (spec §13): MSB-first bit order, 8-bit roots,
    Clear=256 / EOI=257, and the EARLY-CHANGE width bump (the code width
    grows one code sooner than in GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: dict[int, bytes] = {}
    width = 9
    next_code = EOI + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, next_code, prev
        table = {i: bytes([i]) for i in range(256)}
        width = 9
        next_code = EOI + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                continue
            if code == EOI:
                return bytes(out[:expected])
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4094:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            else:
                entry = prev + prev[:1]
                if next_code < 4094:
                    table[next_code] = entry
                    next_code += 1
            out += entry
            prev = entry
            # early change: bump when the NEXT code would not fit
            if next_code + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _unpackbits(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _merge_jpeg_tables(tables: bytes, strip: bytes) -> bytes:
    """New-style JPEG-in-TIFF (tech note 2): tag 347 holds an abbreviated
    table-only stream (SOI · DQT/DHT… · EOI); each strip is an abbreviated
    image stream. Splice the table segments right after the strip's SOI —
    decoders read segments sequentially, so tables land before the SOS that
    needs them. Strips that carry their own tables pass through unchanged
    (later definitions simply overwrite)."""
    if not tables or len(tables) <= 4:
        return strip
    if tables[:2] != b"\xff\xd8":
        raise ValueError("JPEGTables missing SOI")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    if strip[:2] != b"\xff\xd8":
        raise ValueError("JPEG strip missing SOI")
    return strip[:2] + body + strip[2:]


def split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Inverse of :func:`_merge_jpeg_tables` for planted tests: pull the
    DQT/DHT segments of a full JPEG stream into a JPEGTables stream and
    return (tables, abbreviated stream), both SOI/EOI-delimited."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    i = 2
    while i + 2 <= len(stream):
        marker = stream[i + 1]
        if marker == 0xD9:
            rest += b"\xff\xd9"
            break
        if marker == 0xDA:  # SOS header + entropy data through EOI
            rest += stream[i:]
            break
        (ln,) = struct.unpack(">H", stream[i + 2 : i + 4])
        seg = stream[i : i + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        i += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def _decode_tiff_jpeg(payload, tags, compression, h, w, rows_per_strip, photometric):
    """Strip-JPEG raster: every strip decodes through the repo's own T.81
    decoder (`operators/jpeg.py`) and the float rasters stack. Old-style
    compression 6 is supported in its common interchange form (tag 513/514
    pointing at one complete JFIF stream); raw old-style strip fragments
    have no self-contained syntax and stay a named gate."""
    from preprocessor_spark.operators.jpeg import decode_jpeg

    if compression == 6:
        if 513 not in tags:
            raise NotImplementedError(
                "old-style JPEG-in-TIFF without JPEGInterchangeFormat (513) unsupported"
            )
        off = tags[513][0]
        cnt = tags[514][0] if 514 in tags else len(payload) - off
        gray = decode_jpeg(payload[off : off + cnt])[:h, :w]
    else:
        tables = bytes(tags[347]) if 347 in tags else b""
        offsets, counts = tags[273], tags[279]
        parts = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            rows = min(rows_per_strip, h - si * rows_per_strip)
            stream = _merge_jpeg_tables(tables, payload[off : off + cnt])
            # strips are MCU-padded: crop to the strip's true geometry
            parts.append(decode_jpeg(stream)[:rows, :w])
        gray = np.vstack(parts)
    if photometric == 0:  # WhiteIsZero
        gray = 1.0 - gray
    return gray.astype(np.float32)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode → float32 grayscale [0,1] (RGB averaged), matching the other
    decoders' convention."""
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    (n_tags,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    tags = {}
    for t in range(n_tags):
        e = ifd_off + 2 + 12 * t
        tag, ttype, count = struct.unpack(endian + "HHI", payload[e : e + 8])
        tags[tag] = _read_ifd_value(payload, endian, ttype, count, payload[e + 8 : e + 12])

    w = tags[256][0]
    h = tags[257][0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8] * spp)
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    planar = tags.get(284, [1])[0]
    if compression in (6, 7):
        if 322 in tags or 323 in tags:
            raise NotImplementedError("tiled TIFF unsupported (strip layout only)")
        return _decode_tiff_jpeg(
            payload, tags, compression, h, w, tags.get(278, [h])[0], photometric
        )
    if not (all(b == 8 for b in bps) or all(b == 16 for b in bps)):
        raise NotImplementedError(f"TIFF BitsPerSample {bps} unsupported (8/16-bit only)")
    wide = bps[0] == 16
    if planar != 1:
        raise NotImplementedError("TIFF PlanarConfiguration 2 (planar) unsupported")
    predictor = tags.get(317, [1])[0]
    if compression not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression} unsupported (none/LZW/deflate/PackBits/JPEG only)"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported (strip layout only)")

    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [h])[0]
    row_bytes = w * spp * (2 if wide else 1)
    raster = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        rows = min(rows_per_strip, h - si * rows_per_strip)
        if compression == 32773:
            strip = _unpackbits(strip, rows * row_bytes)
        elif compression == 5:
            strip = _lzw_decode_tiff(strip, rows * row_bytes)
        elif compression in (8, 32946):  # (Adobe) deflate: stdlib zlib
            strip = zlib.decompress(strip)
        raster += strip[: rows * row_bytes]
    if wide:
        arr = np.frombuffer(
            bytes(raster), dtype=np.dtype(endian + "u2"), count=h * w * spp
        ).reshape(h, w, spp)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint16)
        img = arr.astype(np.float32) / 65535.0
    else:
        arr = np.frombuffer(bytes(raster), dtype=np.uint8, count=h * row_bytes).reshape(
            h, w, spp
        )
        if predictor == 2:  # horizontal differencing: undo with a row cumsum
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
        img = arr.astype(np.float32) / 255.0
    if spp == 1:
        gray = img[:, :, 0]
        if photometric == 0:  # WhiteIsZero
            gray = 1.0 - gray
        return gray
    return img[:, :, :3].mean(axis=2)


def encode_tiff_jpeg(
    img: np.ndarray,
    rows_per_strip: int | None = None,
    abbreviated: bool = True,
    endian: str = "<",
    old_style: bool = False,
    qval: int = 2,
) -> bytes:
    """Planted-test JPEG-in-TIFF writer: (h, w) gray or (h, w, 3) RGB uint8
    → compression-7 TIFF whose strips are JPEG streams from
    :func:`operators.jpeg.encode_jpeg`. ``abbreviated`` moves the (strip-
    identical — the encoder's tables are fixed) DQT/DHT segments into a
    shared JPEGTables tag 347. ``old_style`` writes compression 6 with one
    full interchange stream behind tags 513/514."""
    from preprocessor_spark.operators.jpeg import encode_jpeg

    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    photometric = 1 if gray else 6  # YCbCr — the JPEG stream carries color
    rps = h if old_style else (rows_per_strip or h)

    strips: list[bytes] = []
    tables = b""
    if old_style:
        strips = [encode_jpeg(img, qval=qval)]
    else:
        for y0 in range(0, h, rps):
            s = encode_jpeg(img[y0 : y0 + rps], qval=qval)
            if abbreviated:
                t, s = split_jpeg_tables(s)
                if tables and t != tables:
                    raise ValueError("strip tables diverge; cannot share JPEGTables")
                tables = t
            strips.append(s)

    def tag(tid, ttype, count, value):
        if ttype == 3 and count == 1:
            return struct.pack(endian + "HHIHH", tid, ttype, count, value, 0)
        return struct.pack(endian + "HHII", tid, ttype, count, value)

    n_strips = len(strips)
    # layout: header(8) · IFD · bps-extra · strip offset/count tables ·
    # JPEGTables blob · strip data
    n_tags = 9 + (1 if tables else 0) + (2 if old_style else 0)
    ifd_size = 2 + 12 * n_tags + 4
    bps_off = 8 + ifd_size
    extra = struct.pack(endian + "HHH", 8, 8, 8) if spp == 3 else b""
    arrays_off = bps_off + len(extra)
    off_table_off = arrays_off
    cnt_table_off = off_table_off + (4 * n_strips if n_strips > 1 else 0)
    tables_off = cnt_table_off + (4 * n_strips if n_strips > 1 else 0)
    data_off = tables_off + len(tables)
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    tags_b = b""
    tags_b += tag(256, 4, 1, w)
    tags_b += tag(257, 4, 1, h)
    if spp == 3:
        tags_b += tag(258, 3, 3, bps_off)
    else:
        tags_b += tag(258, 3, 1, 8)
    tags_b += tag(259, 3, 1, 6 if old_style else 7)
    tags_b += tag(262, 3, 1, photometric)
    if n_strips == 1:
        tags_b += tag(273, 4, 1, offs[0])
        tags_b += tag(277, 3, 1, spp)
        tags_b += tag(278, 4, 1, rps)
        tags_b += tag(279, 4, 1, len(strips[0]))
    else:
        tags_b += tag(273, 4, n_strips, off_table_off)
        tags_b += tag(277, 3, 1, spp)
        tags_b += tag(278, 4, 1, rps)
        tags_b += tag(279, 4, n_strips, cnt_table_off)
    if tables:
        tags_b += tag(347, 7, len(tables), tables_off)
    if old_style:
        tags_b += tag(513, 4, 1, offs[0])
        tags_b += tag(514, 4, 1, len(strips[0]))

    header = struct.pack(endian + "2sHI", b"II" if endian == "<" else b"MM", 42, 8)
    ifd = struct.pack(endian + "H", n_tags) + tags_b + struct.pack(endian + "I", 0)
    out = bytearray(header + ifd + extra)
    if n_strips > 1:
        out += b"".join(struct.pack(endian + "I", o) for o in offs)
        out += b"".join(struct.pack(endian + "I", len(s)) for s in strips)
    out += tables
    for s in strips:
        out += s
    return bytes(out)


def _lzw_encode_literal(raw: bytes) -> bytes:
    """Literal-code TIFF LZW: every byte as its root code, a Clear before
    each early-change width bump. Valid per spec, uncompressed."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    put(CLEAR, 9)
    next_code = EOI + 1
    for b in raw:
        put(b, 9)
        next_code += 1
        if next_code + 1 >= 512 - 1:  # stay below the early-change bump
            put(CLEAR, 9)
            next_code = EOI + 1
    put(EOI, 9)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    endian: str = "<",
    packbits: bool = False,
    rows_per_strip: int | None = None,
    lzw: bool = False,
    deflate: bool = False,
    predictor: bool = False,
) -> bytes:
    """Planted-test TIFF writer: (h, w) gray or (h, w, 3) RGB uint8 →
    baseline TIFF (chunky, 8-bit, optional PackBits or literal-code LZW
    with optional horizontal-differencing predictor, multi-strip)."""
    if sum([packbits, lzw, deflate]) > 1:
        raise ValueError("choose one of packbits/lzw/deflate")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    rps = rows_per_strip or h
    wide = img.dtype == np.uint16
    if predictor:
        arr3 = img.reshape(h, w, spp).astype(np.int64)
        diff = arr3.copy()
        diff[:, 1:, :] = arr3[:, 1:, :] - arr3[:, :-1, :]
        mod = 65536 if wide else 256
        qd = (diff % mod).astype(np.uint16 if wide else np.uint8)
        data = qd.reshape(h, w, spp)
    else:
        data = img.reshape(h, w, spp)
    if wide:
        rows_bytes = data.astype(np.dtype(endian + "u2")).tobytes()
        data = np.frombuffer(rows_bytes, dtype=np.uint8).reshape(h, w * spp * 2)
    else:
        data = data.astype(np.uint8).reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rps):
        raw = data[y0 : y0 + rps].tobytes()
        if deflate:
            strips.append(zlib.compress(raw))
        elif lzw:
            strips.append(_lzw_encode_literal(raw))
        elif packbits:
            out = bytearray()
            i = 0
            n = len(raw)
            while i < n:
                # find run
                j = i
                while j + 1 < n and raw[j + 1] == raw[j] and j - i < 127:
                    j += 1
                if j > i:  # run of j-i+1 identical bytes
                    out.append(257 - (j - i + 1))
                    out.append(raw[i])
                    i = j + 1
                else:  # literal stretch
                    j = i
                    while (
                        j + 1 < n
                        and not (j + 2 < n and raw[j + 1] == raw[j + 2])
                        and j - i < 127
                    ):
                        j += 1
                    out.append(j - i)
                    out += raw[i : j + 1]
                    i = j + 1
            strips.append(bytes(out))
        else:
            strips.append(raw)

    n_tags = 9 + (1 if predictor else 0)
    header = struct.pack(endian + "2sHI", b"II" if endian == "<" else b"MM", 42, 8)
    ifd_size = 2 + 12 * n_tags + 4
    bps_off = 8 + ifd_size
    extra = b""
    bits = 16 if wide else 8
    if spp == 3:
        extra = struct.pack(endian + "HHH", bits, bits, bits)
    arrays_off = bps_off + len(extra)
    n_strips = len(strips)
    off_table_off = arrays_off
    cnt_table_off = off_table_off + 4 * n_strips
    data_off = cnt_table_off + 4 * n_strips
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    def tag(tid, ttype, count, value):
        if ttype == 3 and count == 1:
            return struct.pack(endian + "HHIHH", tid, ttype, count, value, 0)
        return struct.pack(endian + "HHII", tid, ttype, count, value)

    tags_b = b""
    tags_b += tag(256, 4, 1, w)
    tags_b += tag(257, 4, 1, h)
    if spp == 3:
        tags_b += tag(258, 3, 3, bps_off)
    else:
        tags_b += tag(258, 3, 1, bits)
    tags_b += tag(259, 3, 1, 32773 if packbits else (5 if lzw else (8 if deflate else 1)))
    tags_b += tag(262, 3, 1, 2 if spp == 3 else 1)
    if n_strips == 1:
        tags_b += tag(273, 4, 1, offs[0])
    else:
        tags_b += tag(273, 4, n_strips, off_table_off)
    tags_b += tag(277, 3, 1, spp)
    tags_b += tag(278, 4, 1, rps)
    if predictor:
        tags_b += tag(317, 3, 1, 2)
    if n_strips == 1:
        tags_b += tag(279, 4, 1, len(strips[0]))
    else:
        tags_b += tag(279, 4, n_strips, cnt_table_off)
    ifd = struct.pack(endian + "H", n_tags) + tags_b + struct.pack(endian + "I", 0)

    out = bytearray(header + ifd + extra)
    out += b"".join(struct.pack(endian + "I", o) for o in offs)
    out += b"".join(struct.pack(endian + "I", len(s)) for s in strips)
    for s in strips:
        out += s
    return bytes(out)
