"""Audio/video container metadata — typed header facts for opaque
`binary` media columns (the multimodal contract: decode stays out,
plumbing and metadata are real). Parsers are pure-python readers of
the public container specs:

  * WAV  — RIFF chunk walk, `fmt ` + `data` (RIFF/WAVE, MS mmreg)
  * FLAC — STREAMINFO metadata block bit-unpack (xiph FLAC format §
    METADATA_BLOCK_STREAMINFO)
  * MP3  — ID3v2 skip + first MPEG-1 Layer III frame header (ISO/IEC
    11172-3 §2.4.1.3); duration estimated from the byte length at the
    header bitrate (CBR assumption, the standard quick estimate)
  * MP4  — ISO-BMFF box walk to moov/mvhd (ISO/IEC 14496-12 §8.2.2),
    version 0 and 1 boxes
  * AVI  — RIFF walk to hdrl/avih (MS AVIMAINHEADER)

The reference treats every media payload as an opaque attachment
(document_loader.py can_handle routes on extension/MIME only); this
module is part of the driver brief's multimodal family.

Scale shape: ONE Arrow mapInPandas over the media rows — no shuffle,
no per-row Python on the driver; header reads touch only the leading
bytes they need. All derived quantities are integer arithmetic
(floor-div milliseconds), so the DuckDB oracle replays them exactly.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# MPEG-1 Layer III bitrate table, kbit/s (index 1..14); 0/15 invalid
_MP3_BITRATES = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0,
]
_MP3_RATES = [44100, 48000, 32000, 0]


AV_META_FIELDS = (
    "av_format string, duration_ms bigint, sample_rate int, "
    "channels int, bits int, width int, height int, n_bytes bigint"
)

_EMPTY = {
    "av_format": "unknown", "duration_ms": None, "sample_rate": None,
    "channels": None, "bits": None, "width": None, "height": None,
}


def parse_av_meta(b: bytes | None) -> dict:
    """Container metadata dict (see AV_META_FIELDS). ``unknown`` with
    NULL fields when the payload is not a recognized AV container —
    never raises (corrupt-row guard, same stance as rawbytes)."""
    out = dict(_EMPTY)
    out["n_bytes"] = len(b) if b is not None else 0
    if not b or len(b) < 12:
        return out
    try:
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _wav_meta(b, out)
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            return _avi_meta(b, out)
        if b[:4] == b"fLaC":
            return _flac_meta(b, out)
        if b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
            return _mp3_meta(b, out)
        if b[4:8] == b"ftyp":
            return _mp4_meta(b, out)
    except (struct.error, IndexError, ZeroDivisionError):
        out["av_format"] = "corrupt:" + out["av_format"]
    return out


def _wav_meta(b: bytes, out: dict) -> dict:
    out["av_format"] = "wav"
    pos, n = 12, len(b)
    block_align = data_size = None
    while pos + 8 <= n:
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and pos + 24 <= n:
            (_fmt, ch, rate, _byps, ba, bits) = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
            out["channels"], out["sample_rate"], out["bits"] = ch, rate, bits
            block_align = ba
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data_size is not None and block_align and out["sample_rate"]:
        n_samples = data_size // block_align
        out["duration_ms"] = n_samples * 1000 // out["sample_rate"]
    return out


def _flac_meta(b: bytes, out: dict) -> dict:
    out["av_format"] = "flac"
    # first metadata block must be STREAMINFO (34 bytes payload)
    if len(b) < 8 + 34 or (b[4] & 0x7F) != 0:
        return out
    si = b[8 : 8 + 34]
    bits = int.from_bytes(si[10:18], "big")  # rate|ch|bps|samples packing
    rate = (bits >> 44) & 0xFFFFF
    ch = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    out["sample_rate"], out["channels"], out["bits"] = rate, ch, bps
    if rate:
        out["duration_ms"] = total * 1000 // rate
    return out


def _mp3_meta(b: bytes, out: dict) -> dict:
    out["av_format"] = "mp3"
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        # syncsafe 28-bit size + 10-byte header (ID3v2 §3.1)
        size = (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
        pos = 10 + size
    if pos + 4 > len(b):
        return out
    h = b[pos : pos + 4]
    if not (h[0] == 0xFF and (h[1] & 0xFE) == 0xFA):  # MPEG-1 Layer III
        return out
    kbps = _MP3_BITRATES[(h[2] >> 4) & 0xF]
    rate = _MP3_RATES[(h[2] >> 2) & 0x3]
    if not kbps or not rate:
        return out
    out["sample_rate"], out["channels"] = rate, (1 if (h[3] >> 6) == 3 else 2)
    out["bits"] = None  # lossy codec: no PCM bit depth
    audio_bytes = len(b) - pos
    out["duration_ms"] = audio_bytes * 8 // kbps  # /1000 kbps * 1000 ms
    return out


def _mp4_meta(b: bytes, out: dict) -> dict:
    out["av_format"] = "mp4"
    pos, n = 0, len(b)
    while pos + 8 <= n:  # top-level box walk
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        typ = b[pos + 4 : pos + 8]
        if size == 1:
            # ISO-BMFF 64-bit largesize (common on big mdat boxes) —
            # the real size is the 8 bytes after the type field.
            if pos + 16 > n:
                break
            size = struct.unpack(">Q", b[pos + 8 : pos + 16])[0]
            if size < 16:
                break
        elif size == 0:
            # Box extends to end of file; nothing follows it.
            size = n - pos
        elif size < 8:
            break
        if typ == b"moov":
            hdr = 16 if b[pos : pos + 4] == b"\x00\x00\x00\x01" else 8
            inner, end = pos + hdr, min(pos + size, n)
            while inner + 8 <= end:
                isz = struct.unpack(">I", b[inner : inner + 4])[0]
                ityp = b[inner + 4 : inner + 8]
                if isz < 8:
                    break
                if ityp == b"mvhd" and inner + 8 + 4 <= end:
                    ver = b[inner + 8]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", b[inner + 28 : inner + 40]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", b[inner + 20 : inner + 28]
                        )
                    if ts:
                        out["duration_ms"] = dur * 1000 // ts
                inner += isz
        pos += size
    return out


def _avi_meta(b: bytes, out: dict) -> dict:
    out["av_format"] = "avi"
    # LIST hdrl → avih: scan for the avih fourcc (fixed 56-byte body)
    idx = b.find(b"avih")
    if idx < 0 or idx + 8 + 40 > len(b):
        return out
    body = b[idx + 8 :]
    usec_per_frame, _rate, _pad, _flags, total_frames = struct.unpack(
        "<IIIII", body[:20]
    )
    w, h = struct.unpack("<II", body[32:40])
    out["width"], out["height"] = w, h
    out["duration_ms"] = usec_per_frame * total_frames // 1000
    return out


def av_meta(
    df: DataFrame, raw_col: str = "raw", keep: list[str] | None = None
) -> DataFrame:
    """Typed AV metadata per row via one Arrow mapInPandas stage."""
    keep = keep if keep is not None else [c for c in df.columns if c != raw_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    schema = (schema + ", " if schema else "") + AV_META_FIELDS

    cols = list(keep) + [k for k in _EMPTY] + ["n_bytes"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            res = pd.DataFrame([parse_av_meta(x) for x in pdf[raw_col]])
            for c in keep:
                res[c] = pdf[c].values
            yield res[cols]

    return df.mapInPandas(batches, schema=schema)


# ---------------------------------------------------------------------------
# Deterministic fixture builders (invertible-construction oracles).
# ---------------------------------------------------------------------------

def make_fixture_wav(
    sample_rate: int, channels: int, bits: int, n_samples: int
) -> bytes:
    ba = channels * (bits // 8)
    data = b"\x00" * (n_samples * ba)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * ba, ba, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_fixture_flac(
    sample_rate: int, channels: int, bits: int, total_samples: int
) -> bytes:
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total_samples
    )
    si = (
        struct.pack(">HH", 1024, 1024)  # min/max blocksize
        + b"\x00\x00\x00" * 2          # min/max framesize (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                  # md5 of unencoded audio
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def make_fixture_mp3(
    bitrate_idx: int, rate_idx: int, stereo: bool, audio_bytes: int
) -> bytes:
    h = bytes(
        [0xFF, 0xFB, (bitrate_idx << 4) | (rate_idx << 2),
         0x00 if stereo else 0xC0]
    )
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x00"  # empty ID3v2.4 tag
    return tag + h + b"\x00" * max(0, audio_bytes - 4)


def make_fixture_mp4(timescale: int, duration: int) -> bytes:
    mvhd = (
        b"\x00\x00\x00\x00"              # version+flags
        + struct.pack(">II", 0, 0)       # creation/modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80                   # rate..next_track_ID
    )
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def make_fixture_avi(
    usec_per_frame: int, total_frames: int, width: int, height: int
) -> bytes:
    avih = struct.pack(
        "<IIIII", usec_per_frame, 0, 0, 0, total_frames
    ) + b"\x00" * 12 + struct.pack("<II", width, height) + b"\x00" * 16
    hdrl = b"hdrlavih" + struct.pack("<I", len(avih)) + avih
    body = b"AVI LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body
