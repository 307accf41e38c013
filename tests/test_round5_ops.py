"""Round-5 operator tests: fuzzy-join duplication invariance, the
edit-distance-join degenerate-regime guards, and the advisory fixes
(null-safe broadcast merge, null-preserving vector hash, GIF disposal 3)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- fuzzy join


def _canon_pairs(df):
    return sorted(
        (r[0], r[1], round(r[2], 9)) for r in df.collect()
    )


def test_fuzzy_join_collapse_equals_uncollapsed(spark):
    """Side-aware collapse must be invisible in the output: same pairs and
    jaccard values as the uncollapsed run on a corpus where BOTH sides are
    heavily exact-duplicated and verbatim text crosses sides."""
    from preprocessor_spark.operators.fuzzy import fuzzy_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.limit(40)
    # left: base + 3-way duplicates of half of it
    l_dup = base.filter(F.col("doc_id") % 2 == 0)
    left = (
        base.unionByName(l_dup.select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
        .unionByName(l_dup.select((F.col("doc_id") + 20_000).alias("doc_id"), "text"))
    )
    # right: mutated copies (cross-side near-dups) + VERBATIM copies
    # (cross-side exact dups) + right-side-internal duplicates
    mutated = base.select(
        (F.col("doc_id") + 500).alias("rid"),
        F.concat(F.col("text"), F.lit(" tail tokens appended here")).alias("text"),
    )
    verbatim = base.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 900).alias("rid"), "text"
    )
    right = mutated.unionByName(verbatim).unionByName(
        verbatim.select((F.col("rid") + 1_000).alias("rid"), "text")
    )

    a = _canon_pairs(
        fuzzy_join(left, right, "text", "doc_id", "rid", 0.5, 3, collapse_exact=False)
    )
    b = _canon_pairs(
        fuzzy_join(left, right, "text", "doc_id", "rid", 0.5, 3, collapse_exact=True)
    )
    assert a == b
    assert len(a) > 0
    # cross-side verbatim matches must surface at jaccard exactly 1.0
    assert any(j == 1.0 for (_, _, j) in a)


def test_fuzzy_join_collapse_candidate_count_is_duplication_invariant(spark):
    """The whole point of the collapse: the PPJoin runs on one
    representative per (side, content) group, so replicating every row
    k-fold must not grow the similarity join's input."""
    from preprocessor_spark.operators.fuzzy import fuzzy_join

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(30)
    )
    right = docs.select(
        (F.col("doc_id") + 500).alias("rid"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    base_pairs = _canon_pairs(fuzzy_join(docs, right, "text", "doc_id", "rid", 0.5, 3))

    # replicate both sides 5-way
    lrep = docs
    rrep = right
    for i in range(1, 5):
        lrep = lrep.unionByName(
            docs.select((F.col("doc_id") + 100_000 * i).alias("doc_id"), "text")
        )
        rrep = rrep.unionByName(
            right.select((F.col("rid") + 100_000 * i).alias("rid"), "text")
        )
    rep_pairs = _canon_pairs(fuzzy_join(lrep, rrep, "text", "doc_id", "rid", 0.5, 3))
    # every base pair expands to exactly 5x5 member pairs
    assert len(rep_pairs) == 25 * len(base_pairs)
    base_keys = {(a % 100_000, b % 100_000, j) for a, b, j in base_pairs}
    rep_keys = {(a % 100_000, b % 100_000, j) for a, b, j in rep_pairs}
    assert rep_keys == base_keys


def test_fuzzy_join_large_id_precision(spark):
    """Ids near 2^61 must round-trip the parity remap exactly (shiftright,
    not double division)."""
    from preprocessor_spark.operators.fuzzy import fuzzy_join

    big = (1 << 61) + 12345  # would corrupt under double division
    left = spark.createDataFrame(
        [(big, "alpha beta gamma delta epsilon zeta")], ["lid", "text"]
    )
    right = spark.createDataFrame(
        [(big + 7, "alpha beta gamma delta epsilon zeta")], ["rid", "text"]
    )
    rows = fuzzy_join(left, right, "text", "lid", "rid", threshold=0.5).collect()
    assert len(rows) == 1
    assert rows[0]["lid"] == big and rows[0]["rid"] == big + 7


# ------------------------------------------------------ edit-distance guard


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _customer_corpus():
    # the docstring's own degenerate example: one long constant prefix,
    # short distinguishing tail — every segment except the tail is shared
    lefts = [f"Customer#000000{i:04d}" for i in range(120)]
    rights = [f"Customer#000000{i:04d}" for i in range(60, 180)]
    # a few mutations so distances 1/2 appear beyond exact matches
    rights += ["Customer#0000000001x", "Customer#00000000zz"]
    return lefts, rights


def test_edit_join_shared_prefix_corpus_correct_and_bounded(spark):
    """Planted 'Customer#000…' corpus: the corpus-wide prefix strip must
    keep the candidate estimate small enough to clear a TIGHT probe bound,
    and the result must equal brute force."""
    from preprocessor_spark.operators.fuzzy import edit_distance_join

    lefts, rights = _customer_corpus()
    ldf = spark.createDataFrame(list(enumerate(lefts)), ["lid", "s"])
    rdf = spark.createDataFrame(list(enumerate(rights)), ["rid", "s"])

    # tight bound: without the strip this corpus blows through it (see the
    # companion fail-fast test); with the strip it passes comfortably
    got = {
        (r["lid"], r["rid"]): r["dist"]
        for r in edit_distance_join(
            ldf, rdf, "s", "lid", "rid", max_dist=2, max_candidates=40_000
        ).collect()
    }
    want = {
        (i, a_): _lev(s, t)
        for i, s in enumerate(lefts)
        for a_, t in enumerate(rights)
        if _lev(s, t) <= 2
    }
    assert got == want


def test_edit_join_candidate_probe_fails_fast_without_strip(spark):
    """Long-constant-prefix corpus with RANDOM tails: without stripping,
    the prefix-heavy segment makes the candidate join near-quadratic and
    the probe must fail fast; with stripping the same bound clears easily
    (the segments then index the well-spread random tails)."""
    from preprocessor_spark.operators.fuzzy import edit_distance_join

    rng = np.random.RandomState(17)
    alpha = list("abcdef")
    tails = ["".join(rng.choice(alpha, 10)) for _ in range(300)]
    lefts = ["Customer#" + t for t in tails]
    rights = ["Customer#" + "".join(rng.choice(alpha, 10)) for _ in range(300)]
    ldf = spark.createDataFrame(list(enumerate(lefts)), ["lid", "s"])
    rdf = spark.createDataFrame(list(enumerate(rights)), ["rid", "s"])

    with pytest.raises(RuntimeError, match="candidate estimate"):
        edit_distance_join(
            ldf,
            rdf,
            "s",
            "lid",
            "rid",
            max_dist=1,
            strip_common_prefix=False,
            max_candidates=20_000,
        ).collect()
    # identical bound, strip on: passes and matches brute force
    got = sorted(
        (r["lid"], r["rid"], r["dist"])
        for r in edit_distance_join(
            ldf, rdf, "s", "lid", "rid", max_dist=1, max_candidates=20_000
        ).collect()
    )
    want = sorted(
        (i, j, _lev(s, t))
        for i, s in enumerate(lefts)
        for j, t in enumerate(rights)
        if _lev(s, t) <= 1
    )
    assert got == want


def test_edit_join_prefix_strip_preserves_random_corpus(spark):
    """Stripping is a no-op (LCP 0) on a random corpus and must not change
    results; with a planted global prefix results must also be identical to
    the unstripped run (distances are prefix-invariant)."""
    from preprocessor_spark.operators.fuzzy import edit_distance_join

    rng = np.random.RandomState(5)
    alpha = "abcd"
    base = ["".join(rng.choice(list(alpha), rng.randint(1, 8))) for _ in range(30)]
    lefts = ["PFX:" + s for s in base]
    rights = ["PFX:" + "".join(rng.choice(list(alpha), rng.randint(1, 8))) for _ in range(30)]
    ldf = spark.createDataFrame(list(enumerate(lefts)), ["lid", "s"])
    rdf = spark.createDataFrame(list(enumerate(rights)), ["rid", "s"])

    def run(**kw):
        return sorted(
            (r["lid"], r["rid"], r["dist"])
            for r in edit_distance_join(ldf, rdf, "s", "lid", "rid", max_dist=2, **kw).collect()
        )

    stripped = run()
    unstripped = run(strip_common_prefix=False, max_candidates=None)
    assert stripped == unstripped
    want = sorted(
        (i, j, _lev(s, t))
        for i, s in enumerate(lefts)
        for j, t in enumerate(rights)
        if _lev(s, t) <= 2
    )
    assert stripped == want


# ------------------------------------------------- broadcast merge NULL key


def test_merge_upsert_null_key_broadcast_matches_full_outer(spark):
    """A NULL-keyed source row matching a NULL-keyed target row must be an
    UPDATE in both engines — the broadcast path used to also re-insert it."""
    from preprocessor_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10), (None, "nullkey", 20), (3, "c", 30)],
        "k int, name string, v int",
    )
    source = spark.createDataFrame(
        [(None, 99), (4, 40)], "k int, v int"
    )

    def canon(df):
        return sorted(
            ((r["k"], r["name"], r["v"]) for r in df.collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    full = canon(merge_upsert(target, source, ["k"], broadcast_source=False))
    bcast = canon(merge_upsert(target, source, ["k"], broadcast_source=True))
    assert full == bcast
    # the NULL-key row was updated once, not duplicated
    assert sorted(full, key=str) == sorted(
        [(None, "nullkey", 99), (1, "a", 10), (3, "c", 30), (4, None, 40)], key=str
    )


# ------------------------------------------- semdedup null-preserving hash


def test_semdedup_collapse_distinguishes_null_elements(spark):
    """Vectors differing only by NULL elements must NOT hash to the same
    exact-duplicate group (concat_ws silently dropped nulls)."""
    from preprocessor_spark.operators.semdedup import semantic_dedup_pairs

    rows = [
        (1, [1.0, None, 0.0]),
        (2, [1.0, 0.0, None]),  # concat_ws-identical to row 1, NOT equal
        (3, [0.5, 0.5, 0.5]),
        (4, [0.5, 0.5, 0.5]),  # true exact duplicate of 3
        (5, [0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id bigint, vec array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_pairs(
            df, "vec", "id", threshold=0.99, n_clusters=1, sample_rows=8
        ).collect()
    }
    assert (1, 2) not in pairs  # the old hash emitted this as cosine 1.0
    assert pairs.get((3, 4)) == 1.0  # true duplicates still collapse


# ------------------------------------------------------- JPEG-in-TIFF


def test_jpeg_in_tiff_roundtrip_variants():
    """Compression-7 strips must decode bit-identically to the bare JPEG
    streams they wrap, across: self-contained strips, abbreviated strips +
    shared JPEGTables (tag 347), multi-strip, big-endian, RGB, and
    old-style compression 6 via the 513/514 interchange pointer."""
    from preprocessor_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from preprocessor_spark.operators.tiff import decode_tiff, encode_tiff_jpeg

    rng = np.random.RandomState(23)
    g = rng.randint(0, 256, (21, 17)).astype(np.uint8)
    c = rng.randint(0, 256, (16, 11, 3)).astype(np.uint8)

    # single strip, self-contained: TIFF == bare JPEG decode
    want_g = decode_jpeg(encode_jpeg(g, qval=2))
    got = decode_tiff(encode_tiff_jpeg(g, abbreviated=False))
    assert np.array_equal(got, want_g)

    # abbreviated + JPEGTables merge
    got = decode_tiff(encode_tiff_jpeg(g, abbreviated=True))
    assert np.array_equal(got, want_g)

    # multi-strip abbreviated (strip height 8 → separate JPEG per strip)
    got = decode_tiff(encode_tiff_jpeg(g, rows_per_strip=8, abbreviated=True))
    want_strips = np.vstack(
        [decode_jpeg(encode_jpeg(g[y0 : y0 + 8], qval=2)) for y0 in range(0, 21, 8)]
    )
    assert np.array_equal(got, want_strips)

    # RGB (photometric YCbCr carried inside the JPEG stream), big-endian IFD
    want_c = decode_jpeg(encode_jpeg(c, qval=2))
    got = decode_tiff(encode_tiff_jpeg(c, abbreviated=True, endian=">"))
    assert np.array_equal(got, want_c)

    # old-style compression 6 interchange form
    got = decode_tiff(encode_tiff_jpeg(g, old_style=True))
    assert np.array_equal(got, want_g)


def test_jpeg_in_tiff_through_decode_image():
    """The generic dispatch must route JPEG-in-TIFF payloads too."""
    from preprocessor_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from preprocessor_spark.operators.multimodal import decode_image
    from preprocessor_spark.operators.tiff import encode_tiff_jpeg

    rng = np.random.RandomState(29)
    g = rng.randint(0, 256, (12, 9)).astype(np.uint8)
    out = decode_image(encode_tiff_jpeg(g, abbreviated=True))
    assert out.dtype == np.float32
    assert np.array_equal(out, decode_jpeg(encode_jpeg(g, qval=2)))


def test_tiff_old_style_jpeg_without_pointer_raises():
    import struct as st

    from preprocessor_spark.operators.tiff import decode_tiff, encode_tiff

    payload = bytearray(encode_tiff(np.zeros((4, 4), dtype=np.uint8)))
    i = payload.index(st.pack("<HH", 259, 3))
    payload[i + 8 : i + 10] = st.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="JPEGInterchangeFormat"):
        decode_tiff(bytes(payload))


# ------------------------------------------------------ ts feature breadth


def test_ts_features_c3_cid_fft_vs_numpy(spark):
    """The round-5 tsfresh catalog additions against their literal numpy
    definitions on a planted series: c3(lag) = mean(x_i·x_{i+l}·x_{i+2l}),
    cid_ce = sqrt(Σ diff²) (raw and z-normalized), and the opt-in DFT
    coefficient magnitudes against np.fft.fft."""
    from preprocessor_spark.operators.ts_features import extract_ts_features

    rng = np.random.RandomState(41)
    xs = rng.randn(64) * 3 + 1.5
    rows = [(1, i, float(v)) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "sid int, t int, value double")
    feats = extract_ts_features(
        df, time="t", column_id="sid", fft_coefficients=(1, 2, 3)
    ).collect()[0]

    for lag in (1, 2, 3):
        want = float(np.mean(xs[2 * lag :] * xs[lag : -lag] * xs[: -2 * lag]))
        assert feats[f"value__c3_lag_{lag}"] == pytest.approx(want, rel=1e-9), lag

    d = np.diff(xs)
    assert feats["value__cid_ce"] == pytest.approx(float(np.sqrt((d * d).sum())), rel=1e-12)
    z = (xs - xs.mean()) / xs.std()
    dz = np.diff(z)
    assert feats["value__cid_ce_normalized"] == pytest.approx(
        float(np.sqrt((dz * dz).sum())), rel=1e-9
    )

    spec = np.abs(np.fft.fft(xs))
    for k in (1, 2, 3):
        assert feats[f"value__fft_abs_{k}"] == pytest.approx(float(spec[k]), rel=1e-9), k

    # constant series: normalized cid is NULL (tsfresh NaN), raw cid is 0
    const = spark.createDataFrame([(1, i, 5.0) for i in range(10)], "sid int, t int, value double")
    f2 = extract_ts_features(const, time="t", column_id="sid").collect()[0]
    assert f2["value__cid_ce"] == 0.0
    assert f2["value__cid_ce_normalized"] is None


# ------------------------------------------------------- video containers


def _encode_mov_mjpeg(frames, fps):
    from preprocessor_spark.operators.multimodal import encode_mov_mjpeg

    return encode_mov_mjpeg(frames, fps)


def _encode_avi_rgb(rasters, fps):
    from preprocessor_spark.operators.multimodal import encode_avi_rgb

    return encode_avi_rgb(rasters, fps)


def test_video_rgb_avi_frame_sampling(spark):
    """Uncompressed BI_RGB AVI decodes without any JPEG step: sampled
    frames carry EXACT pixel means (no lossy codec in the path)."""
    from preprocessor_spark.operators.multimodal import decode_avi_frames, sample_video_frames

    rasters = [np.full((12, 10), 25 * i, dtype=np.uint8) for i in range(8)]
    avi = _encode_avi_rgb(rasters, fps=10)

    frames, fps = decode_avi_frames(avi)
    assert len(frames) == 8 and fps == pytest.approx(10.0)
    for i, f in enumerate(frames):
        assert isinstance(f, np.ndarray) and f.shape == (12, 10)
        assert f.mean() == pytest.approx(25 * i / 255.0, abs=1e-6)

    df = spark.createDataFrame([(3, avi)], "id bigint, v binary")
    out = sample_video_frames(df, "id", "v", every_ms=200).toPandas().sort_values("frame_index")
    assert out.frame_index.tolist() == [0, 2, 4, 6]
    assert out.width.tolist() == [10] * 4 and out.height.tolist() == [12] * 4
    for fi, mi in zip(out.frame_index, out.mean_intensity):
        assert mi == pytest.approx(25 * fi / 255.0, abs=1e-6)  # float32 mean


def test_video_mjpeg_mov_frame_sampling(spark):
    """Photo-JPEG MOV: the ISO-BMFF sample-table walk must recover exactly
    the planted JPEG frames (byte-identical) and the stts/mdhd frame rate;
    sampling through Spark matches the AVI path's behavior."""
    from preprocessor_spark.operators.jpeg import encode_jpeg
    from preprocessor_spark.operators.multimodal import decode_mov_mjpeg, sample_video_frames

    rasters = [np.full((16, 16), 20 * i, dtype=np.uint8) for i in range(10)]
    jpegs = [encode_jpeg(r, qval=1) for r in rasters]
    mov = _encode_mov_mjpeg(jpegs, fps=20)

    frames, fps = decode_mov_mjpeg(mov)
    assert fps == pytest.approx(20.0)
    assert frames == jpegs  # byte-identical sample extraction

    df = spark.createDataFrame([(9, mov)], "id bigint, v binary")
    out = sample_video_frames(df, "id", "v", every_ms=100).toPandas().sort_values("frame_index")
    assert out.frame_index.tolist() == [0, 2, 4, 6, 8]
    assert out.t_ms.tolist() == [0.0, 100.0, 200.0, 300.0, 400.0]
    for fi, mi in zip(out.frame_index, out.mean_intensity):
        assert mi == pytest.approx(20 * fi / 255.0, abs=2 / 255)


def test_video_intra_frame_codecs_still_gated():
    """True inter-frame codecs keep their named gates in both containers."""
    from preprocessor_spark.operators.multimodal import decode_mov_mjpeg, decode_video_frames

    rasters = [np.zeros((4, 4), dtype=np.uint8)]
    mov = _encode_mov_mjpeg([b"\x00\x00\x00\x01fakeh264"], fps=10)
    mov = mov.replace(b"jpeg", b"avc1", 1)  # flip the stsd fourcc
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mov_mjpeg(mov)

    avi = _encode_avi_rgb(rasters, fps=10)
    avi = avi.replace(b"00db", b"00dc", 1)  # claim compressed, non-JPEG body
    with pytest.raises(NotImplementedError, match="(?i)mjpeg|ffmpeg"):
        decode_video_frames(avi)


# ------------------------------------------------------- GIF disposal 3


def _gif_image_block(frame: np.ndarray, fx: int, fy: int) -> bytes:
    """Image block (descriptor + LZW data) for a sub-region frame, built by
    encoding a single-frame GIF and splicing out its image block, then
    patching the descriptor origin."""
    from preprocessor_spark.operators.gif import encode_gif

    palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    single = encode_gif(frame, palette)
    # layout: 6 header + 7 LSD + 768 palette + image block + 1 trailer
    block = bytearray(single[13 + 768 : -1])
    assert block[0] == 0x2C
    struct.pack_into("<HH", block, 1, fx, fy)
    return bytes(block)


def test_gif_disposal_restore_to_previous(spark):
    """Disposal 3: after the frame is displayed, its region reverts to the
    pre-draw canvas — later frames must composite over the RESTORED pixels."""
    from preprocessor_spark.operators.gif import decode_gif_frames

    palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    f1 = np.full((4, 4), 64, dtype=np.uint8)  # base canvas: mid gray
    f2 = np.full((2, 2), 255, dtype=np.uint8)  # white patch at (1,1), disposal 3
    f3 = np.full((1, 1), 255, dtype=np.uint8)  # 1px at (0,0) after restore

    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 4, 4, 0x87, 0, 0)  # GCT, 256 entries
    gif += palette.tobytes()
    gif += _gif_image_block(f1, 0, 0)
    gif += b"\x21\xf9\x04" + bytes([3 << 2, 0, 0, 0]) + b"\x00"  # GCE disposal=3
    gif += _gif_image_block(f2, 1, 1)
    gif += b"\x21\xf9\x04" + bytes([0, 0, 0, 0]) + b"\x00"  # GCE disposal=0
    gif += _gif_image_block(f3, 0, 0)
    gif += b"\x3b"

    frames = decode_gif_frames(bytes(gif))
    assert len(frames) == 3
    g = 64 / 255.0
    # frame 2 shows the white patch
    assert frames[1][1, 1] == pytest.approx(1.0)
    assert frames[1][0, 0] == pytest.approx(g)
    # frame 3: patch region RESTORED to frame-1 gray; only (0,0) is white
    assert frames[2][1, 1] == pytest.approx(g)
    assert frames[2][2, 2] == pytest.approx(g)
    assert frames[2][0, 0] == pytest.approx(1.0)
