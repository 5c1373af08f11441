from __future__ import annotations

from extractthinker_spark.operators.av import (
    av_meta,
    make_fixture_avi,
    make_fixture_flac,
    make_fixture_mp3,
    make_fixture_mp4,
    make_fixture_wav,
    parse_av_meta,
)


def test_wav_round_trip():
    m = parse_av_meta(make_fixture_wav(16000, 2, 16, 8000))
    assert m["av_format"] == "wav"
    assert (m["sample_rate"], m["channels"], m["bits"]) == (16000, 2, 16)
    assert m["duration_ms"] == 500  # 8000 samples @ 16 kHz
    assert m["n_bytes"] == 44 + 8000 * 4


def test_flac_round_trip():
    m = parse_av_meta(make_fixture_flac(44100, 2, 24, 441000))
    assert m["av_format"] == "flac"
    assert (m["sample_rate"], m["channels"], m["bits"]) == (44100, 2, 24)
    assert m["duration_ms"] == 10000
    assert m["n_bytes"] == 42


def test_mp3_round_trip():
    # bitrate idx 9 -> 128 kbps, rate idx 0 -> 44100, mono
    m = parse_av_meta(make_fixture_mp3(9, 0, False, 16000))
    assert m["av_format"] == "mp3"
    assert (m["sample_rate"], m["channels"], m["bits"]) == (44100, 1, None)
    assert m["duration_ms"] == 16000 * 8 // 128  # = 1000 ms
    assert m["n_bytes"] == 10 + 16000


def test_mp4_round_trip():
    m = parse_av_meta(make_fixture_mp4(600, 18000))
    assert m["av_format"] == "mp4"
    assert m["duration_ms"] == 30000
    assert m["sample_rate"] is None and m["width"] is None


def test_mp4_largesize_and_eof_boxes():
    """ISO-BMFF size==1 (64-bit largesize, common on big mdat) and
    size==0 (extends to EOF) must not abort the top-level walk — moov
    placed after such boxes is still reached."""
    import struct

    base = make_fixture_mp4(600, 18000)
    ftyp, moov = base[:16], base[16:]
    payload = b"\x00" * 64
    large_mdat = (
        struct.pack(">I", 1) + b"mdat"
        + struct.pack(">Q", 16 + len(payload)) + payload
    )
    m = parse_av_meta(ftyp + large_mdat + moov)
    assert m["av_format"] == "mp4" and m["duration_ms"] == 30000

    # size==0 mdat swallows everything after it, so put moov FIRST and
    # check the walk still terminates cleanly with the right duration.
    eof_mdat = struct.pack(">I", 0) + b"mdat" + payload
    m2 = parse_av_meta(ftyp + moov + eof_mdat)
    assert m2["duration_ms"] == 30000

    # truncated largesize header: bail without raising
    m3 = parse_av_meta(ftyp + struct.pack(">I", 1) + b"mdat")
    assert m3["av_format"] == "mp4" and m3["duration_ms"] is None


def test_avi_round_trip():
    m = parse_av_meta(make_fixture_avi(33333, 300, 640, 480))
    assert m["av_format"] == "avi"
    assert (m["width"], m["height"]) == (640, 480)
    assert m["duration_ms"] == 33333 * 300 // 1000


def test_corrupt_and_unknown_never_raise():
    assert parse_av_meta(None)["av_format"] == "unknown"
    assert parse_av_meta(b"")["av_format"] == "unknown"
    assert parse_av_meta(b"short")["av_format"] == "unknown"
    # truncated WAV: RIFF/WAVE magic but no chunks
    m = parse_av_meta(b"RIFF\x00\x00\x00\x00WAVE")
    assert m["av_format"] == "wav" and m["duration_ms"] is None
    # MPEG sync byte but invalid bitrate index (15)
    bad = bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 16
    m = parse_av_meta(bad)
    assert m["av_format"] == "mp3" and m["duration_ms"] is None


def test_av_meta_df_no_shuffle(spark):
    df = spark.createDataFrame(
        [(0, make_fixture_wav(8000, 1, 16, 400)), (1, b"junk")],
        "doc_id long, raw binary",
    )
    out = av_meta(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["av_format"] == "wav" and rows[1]["av_format"] == "unknown"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
