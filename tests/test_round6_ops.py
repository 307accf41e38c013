"""Round-6 operator tests: streaming WARC parsing, Avro data source,
tsfresh-parity relevance filter, embed-neardup collapse, IVF pruning
proof, PageRank skew evidence."""

from __future__ import annotations

import gzip

import pytest


def _warc_record(rid: bytes, uri: bytes, body: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    payload = http + body
    hdr = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid + b">\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return hdr + payload + b"\r\n\r\n"


class TestEmbedNeardupCollapse:
    def test_collapsed_equals_uncollapsed_on_duplicated_corpus(self, spark):
        """collapse_exact is an equivalence, not an approximation:
        identical vectors share band keys, so rep-level LSH + group
        expansion emits EXACTLY the member-level pair set, for both
        engines, on a corpus with 4-way exact duplication plus near-dups."""
        import numpy as np

        from preprocessor_spark.operators.dedup import embedding_neardup_pairs

        rng = np.random.RandomState(3)
        base_vecs = rng.randn(12, 16)
        rows = []
        vid = 0
        for i, v in enumerate(base_vecs):
            copies = 4 if i % 3 == 0 else 1
            for _ in range(copies):
                rows.append((vid, [float(x) for x in v]))
                vid += 1
            if i % 4 == 0:  # a near (not exact) duplicate
                w = v.copy()
                w[0] *= 1.02
                rows.append((vid, [float(x) for x in w]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        for engine in ("numpy", "expr"):
            got = sorted(
                (r["id_a"], r["id_b"], round(r["cosine"], 9))
                for r in embedding_neardup_pairs(
                    df, "embedding", "vec_id", threshold=0.9,
                    n_planes=16, bands=4, engine=engine, collapse_exact=True,
                ).collect()
            )
            want = sorted(
                (r["id_a"], r["id_b"], round(r["cosine"], 9))
                for r in embedding_neardup_pairs(
                    df, "embedding", "vec_id", threshold=0.9,
                    n_planes=16, bands=4, engine=engine, collapse_exact=False,
                ).collect()
            )
            assert got == want and len(got) > 0, engine
            # duplication actually exercised: within-group 1.0 pairs exist
            assert any(c == 1.0 for _, _, c in got)


class TestWarcStreamingParse:
    def test_chunked_equals_oneshot(self):
        """Framing is chunk-boundary-invariant: 1-byte chunks produce the
        same records as the whole buffer at once (headers, CRLF skips and
        payloads may all straddle chunk boundaries)."""
        from preprocessor_spark.sources.warc import (
            parse_warc_records,
            parse_warc_stream,
        )

        blob = b"".join(
            _warc_record(b"r%d" % i, b"https://ex.com/%d" % i, b"b\r\n\r\nody%d" % i)
            for i in range(5)
        )
        one = list(parse_warc_records(blob))
        tiny = list(parse_warc_stream(bytes([c]) for c in blob))
        assert tiny == one and len(one) == 5

    def test_gz_member_streaming_bounded(self, tmp_path):
        """.warc.gz inflates member-by-member: the chunk iterator never
        yields (hence the parser never buffers) anything near the full
        decompressed shard size."""
        from preprocessor_spark.sources.warc import _shard_chunks, parse_warc_stream

        recs = [
            _warc_record(b"r%d" % i, b"https://ex.com/%d" % i, b"x" * 10_000)
            for i in range(50)
        ]
        p = tmp_path / "big.warc.gz"
        p.write_bytes(b"".join(gzip.compress(r) for r in recs))
        total = sum(len(r) for r in recs)
        seen = 0
        max_chunk = 0
        out = []
        chunks = []
        for c in _shard_chunks(str(p)):
            max_chunk = max(max_chunk, len(c))
            seen += len(c)
            chunks.append(c)
        assert seen == total
        # one member decompresses to ~10 KB; nothing near the 500 KB shard
        assert max_chunk < 64 * 1024
        out = list(parse_warc_stream(iter(chunks)))
        assert len(out) == 50
        assert out[7][5] == b"x" * 10_000

    def test_file_handle_closed(self, tmp_path):
        """The shard file handle lives in a context manager — closed both
        on full consumption and on early generator drop."""
        from preprocessor_spark.sources.warc import _shard_chunks, iter_warc_records

        p = tmp_path / "s.warc"
        p.write_bytes(_warc_record(b"a", b"https://e.com/1", b"hello") * 3)
        list(iter_warc_records(str(p)))
        g = _shard_chunks(str(p))
        next(g)
        g.close()  # must not raise; context manager unwinds

    def test_truncated_tail_raises(self, tmp_path):
        from preprocessor_spark.sources.warc import iter_warc_records

        good = _warc_record(b"a", b"https://e.com/1", b"hello world")
        p = tmp_path / "t.warc"
        p.write_bytes(good[:-10])
        with pytest.raises(ValueError, match="truncated"):
            list(iter_warc_records(str(p)))

    def test_mov_mdhd_version1_timescale(self):
        """A version-1 mdhd (64-bit create/modify times) shifts the
        timescale field by 8 bytes; the decoder must read it from the
        right offset instead of silently misreading fps (ADVICE r5).
        Built by box surgery on the v0 encoder output (mdat precedes
        moov, so growing moov can't break stco offsets)."""
        import numpy as np

        from preprocessor_spark.operators import multimodal as mm
        from preprocessor_spark.operators.jpeg import encode_jpeg

        jpegs = [encode_jpeg(np.full((8, 8), 100, dtype=np.uint8), qval=1)] * 4
        mov = mm.encode_mov_mjpeg(jpegs, fps=25)

        moov_b, moov_e = mm._find_box(mov, 0, len(mov), b"moov")
        trak = next(
            (b, e) for t, b, e in mm._iter_boxes(mov, moov_b, moov_e) if t == b"trak"
        )
        mdia_b, mdia_e = mm._find_box(mov, *trak, b"mdia")
        mdhd_b, mdhd_e = mm._find_box(mov, mdia_b, mdia_e, b"mdhd")
        assert mov[mdhd_b] == 0
        ts4 = mov[mdhd_b + 12 : mdhd_b + 16]
        dur4 = mov[mdhd_b + 16 : mdhd_b + 20]
        rest = mov[mdhd_b + 20 : mdhd_e]
        v1_body = (
            bytes([1])
            + mov[mdhd_b + 1 : mdhd_b + 4]  # flags
            + b"\x00" * 16  # 64-bit ctime + mtime
            + ts4
            + b"\x00" * 4
            + dur4  # 64-bit duration
            + rest
        )
        new_box = (8 + len(v1_body)).to_bytes(4, "big") + b"mdhd" + v1_body
        delta = len(new_box) - (mdhd_e - (mdhd_b - 8))
        assert delta == 12
        patched = bytearray(mov[: mdhd_b - 8] + new_box + mov[mdhd_e:])
        for start in (moov_b - 8, trak[0] - 8, mdia_b - 8):
            old = int.from_bytes(patched[start : start + 4], "big")
            patched[start : start + 4] = (old + delta).to_bytes(4, "big")

        frames, fps = mm.decode_mov_mjpeg(bytes(patched))
        assert fps == pytest.approx(25.0)
        assert frames == jpegs

        # unknown version fails loudly instead of misreading
        bad = bytearray(patched)
        bad[mdhd_b - 8 + 8] = 2
        with pytest.raises(NotImplementedError, match="mdhd version 2"):
            mm.decode_mov_mjpeg(bytes(bad))

    def test_gz_multi_member_chunk_boundary(self, tmp_path):
        """Member boundaries falling inside a 1 MiB compressed read are
        handled: many small members per read block."""
        from preprocessor_spark.sources.warc import iter_warc_records

        recs = [
            _warc_record(b"m%d" % i, b"https://ex.com/m%d" % i, b"body%d" % i)
            for i in range(200)
        ]
        p = tmp_path / "many.warc.gz"
        p.write_bytes(b"".join(gzip.compress(r) for r in recs))
        got = list(iter_warc_records(str(p)))
        assert [g[2] for g in got] == [f"https://ex.com/m{i}" for i in range(200)]
