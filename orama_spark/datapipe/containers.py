"""MP3 / MP4 container METADATA parsing — stdlib struct walking.

A 100 TB media pipeline needs container metadata (duration, bitrate,
sample rate, track layout) long before it needs decoded samples: it
drives token/compute budgeting, frame-sampling plans and validity
filtering. This module parses that metadata from the raw bytes —
MPEG audio frame headers (ISO/IEC 11172-3 / 13818-3) and the ISO
base-media-file-format box tree (ISO/IEC 14496-12) — with no codec
library. The codec payloads themselves (MDCT audio, H.26x video)
remain honest strict-mode stubs in ``multimodal.extract_*``.

All derived quantities use INTEGER arithmetic (floor division), so a
closed-form SQL oracle can reproduce them bit-exactly.

Reference scope: the reference engine (oramasearch/orama) has no media
pipeline; this is part of the training-data-pipeline surface the brief
adds on top of SURVEY.md §2 (multimodal columns = opaque binary +
typed metadata).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- MP3

# bitrate tables (kbps), index 1..14; 0 = "free", 15 = invalid
_BR_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_BR_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BR_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256]
_BR_V2_L23 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
# sample-rate tables by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5)
_SRATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _mp3_frame(b: bytes, i: int) -> Optional[dict]:
    """Parse one MPEG audio frame header at offset i; None if invalid."""
    if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
        return None
    h1, h2, h3 = b[i + 1], b[i + 2], b[i + 3]
    ver = (h1 >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h1 >> 1) & 3        # 1=III, 2=II, 3=I, 0=reserved
    br_idx = (h2 >> 4) & 15
    sr_idx = (h2 >> 2) & 3
    pad = (h2 >> 1) & 1
    chmode = (h3 >> 6) & 3       # 3=mono
    if ver == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    if ver == 3:
        br = (_BR_V1_L1, _BR_V1_L2, _BR_V1_L3)[3 - layer]
    else:
        br = _BR_V2_L1 if layer == 3 else _BR_V2_L23
    bitrate = br[br_idx] * 1000
    srate = _SRATES[ver][sr_idx]
    if layer == 3:               # Layer I
        flen = (12 * bitrate // srate + pad) * 4
        samples = 384
    elif layer == 2:             # Layer II
        flen = 144 * bitrate // srate + pad
        samples = 1152
    else:                        # Layer III
        if ver == 3:
            flen = 144 * bitrate // srate + pad
            samples = 1152
        else:
            flen = 72 * bitrate // srate + pad
            samples = 576
    return {
        "ver": ver, "layer": layer, "bitrate": bitrate, "srate": srate,
        "samples": samples, "flen": flen,
        "channels": 1 if chmode == 3 else 2,
    }


def parse_mp3(b: bytes) -> Optional[dict]:
    """Walk MPEG audio frames -> container metadata, or None.

    Skips a leading ID3v2 tag (syncsafe size, footer flag honored) and
    scans to the first sync word; thereafter frames must chain
    contiguously (framelen arithmetic) until EOF or a trailing ID3v1
    ``TAG``. duration_ms = total_samples * 1000 // first_sample_rate —
    integer floor so the value is oracle-expressible exactly.
    """
    if b is None or len(b) < 4:
        return None
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        i = 10 + _syncsafe(b[6:10]) + (10 if b[5] & 0x10 else 0)
    # scan to first sync (bounded: a real stream syncs immediately;
    # garbage prefixes up to 64 KiB are tolerated like common taggers)
    limit = min(len(b) - 4, i + 65536)
    first = None
    while i <= limit:
        first = _mp3_frame(b, i)
        if first is not None:
            break
        i += 1
    if first is None:
        return None
    n_frames = 0
    total_samples = 0
    bitrate_sum = 0
    cbr = True
    while True:
        fr = _mp3_frame(b, i)
        # a frame counts only when its WHOLE body is present — a
        # truncated tail frame is not audio (and the oracle's
        # closed-form frame count must not depend on cut position)
        if fr is None or fr["srate"] != first["srate"] or i + fr["flen"] > len(b):
            break
        n_frames += 1
        total_samples += fr["samples"]
        bitrate_sum += fr["bitrate"]
        cbr = cbr and fr["bitrate"] == first["bitrate"]
        i += fr["flen"]
        if b[i : i + 3] == b"TAG":
            break
    if n_frames == 0:
        return None
    return {
        "container": "mp3",
        "mpeg_version": {3: 1, 2: 2, 0: 25}[first["ver"]],
        "layer": 4 - first["layer"],
        "sample_rate": first["srate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_ms": total_samples * 1000 // first["srate"],
        "bitrate_kbps": bitrate_sum // (n_frames * 1000),
        "cbr": cbr,
    }


def synth_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3_title: Optional[bytes] = None,
    fill: int = 0,
) -> bytes:
    """Deterministic valid MPEG-1 Layer III stream (CBR, no padding
    bit). ``id3_title`` prepends an ID3v2.3 tag so the skip path is
    exercised. Filler bytes avoid 0xFF so no false sync exists."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = _BR_V1_L3.index(bitrate_kbps)
    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),
            (0xC0 if mono else 0x00),
        ]
    )
    flen = 144 * bitrate_kbps * 1000 // sample_rate
    body = bytes((fill + j) % 255 for j in range(flen - 4))
    out = bytearray()
    if id3_title is not None:
        frame = b"TIT2" + len(id3_title).to_bytes(4, "big") + b"\x00\x00" + id3_title
        sz = len(frame)
        out += b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + frame
    for _ in range(n_frames):
        out += hdr + body
    return bytes(out)


# ---------------------------------------------------------------- MP4

def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end);
    stops (yields nothing more) on malformed sizes."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(b[off : off + 4], "big")
        typ = b[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return
            size = int.from_bytes(b[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            return
        yield typ, off + hdr, off + size
        off += size


def parse_mp4(b: bytes) -> Optional[dict]:
    """ISO-BMFF box walk -> {brand, timescale, duration_ms, n_tracks},
    or None when no ftyp/moov structure is present. Handles 64-bit
    largesize boxes and mvhd version 0/1. duration_ms uses integer
    floor (duration * 1000 // timescale)."""
    if b is None or len(b) < 16:
        return None
    brand = None
    timescale = None
    duration = None
    n_tracks = 0
    for typ, s, e in _walk_boxes(b, 0, len(b)):
        if typ == b"ftyp" and e - s >= 4:
            brand = b[s : s + 4].decode("ascii", "replace").strip()
        elif typ == b"moov":
            for ctyp, cs, ce in _walk_boxes(b, s, e):
                if ctyp == b"mvhd" and ce - cs >= 20:
                    ver = b[cs]
                    if ver == 1 and ce - cs >= 32:
                        timescale = int.from_bytes(b[cs + 20 : cs + 24], "big")
                        duration = int.from_bytes(b[cs + 24 : cs + 32], "big")
                    else:
                        timescale = int.from_bytes(b[cs + 12 : cs + 16], "big")
                        duration = int.from_bytes(b[cs + 16 : cs + 20], "big")
                elif ctyp == b"trak":
                    n_tracks += 1
    if brand is None and timescale is None:
        return None
    return {
        "container": "mp4",
        "brand": brand,
        "timescale": timescale,
        "duration_ms": (
            duration * 1000 // timescale if timescale else None
        ),
        "n_tracks": n_tracks,
    }


def _box(typ: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def synth_mp4(
    duration_ms: int,
    timescale: int = 1000,
    n_tracks: int = 1,
    brand: str = "isom",
    mvhd_v1: bool = False,
    mdat_bytes: int = 64,
    fill: int = 0,
) -> bytes:
    """Deterministic minimal-but-well-formed MP4: ftyp + moov(mvhd +
    n_tracks × trak(tkhd)) + mdat. Choose duration_ms so that
    duration_ms * timescale is divisible by 1000 if exact round-trip
    is required (the driver gate does)."""
    dur = duration_ms * timescale // 1000
    if mvhd_v1:
        mvhd = (
            b"\x01\x00\x00\x00"
            + (0).to_bytes(8, "big") * 2
            + timescale.to_bytes(4, "big")
            + dur.to_bytes(8, "big")
            + (0x00010000).to_bytes(4, "big")
            + (0x0100).to_bytes(2, "big")
            + b"\x00" * 10
            + _UNITY_MATRIX
            + b"\x00" * 24
            + (n_tracks + 1).to_bytes(4, "big")
        )
    else:
        mvhd = (
            b"\x00\x00\x00\x00"
            + (0).to_bytes(4, "big") * 2
            + timescale.to_bytes(4, "big")
            + dur.to_bytes(4, "big")
            + (0x00010000).to_bytes(4, "big")
            + (0x0100).to_bytes(2, "big")
            + b"\x00" * 10
            + _UNITY_MATRIX
            + b"\x00" * 24
            + (n_tracks + 1).to_bytes(4, "big")
        )
    traks = b""
    for t in range(n_tracks):
        tkhd = (
            b"\x00\x00\x00\x07"
            + (0).to_bytes(4, "big") * 2
            + (t + 1).to_bytes(4, "big")
            + b"\x00" * 4
            + dur.to_bytes(4, "big")
            + b"\x00" * 8
            + (0).to_bytes(2, "big") * 2
            + b"\x00" * 4
            + _UNITY_MATRIX
            + (0).to_bytes(4, "big") * 2
        )
        traks += _box(b"trak", _box(b"tkhd", tkhd))
    ftyp = _box(b"ftyp", brand.encode("ascii") + (0).to_bytes(4, "big") + b"isommp42")
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    mdat = _box(b"mdat", bytes((fill + j) % 255 for j in range(mdat_bytes)))
    return ftyp + moov + mdat


_UNITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + b"\x00" * 12
    + (0x00010000).to_bytes(4, "big") + b"\x00" * 12
    + (0x40000000).to_bytes(4, "big")
)


# ------------------------------------------------------------- Spark

CONTAINER_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("container", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("bitrate_kbps", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("brand", StringType(), True),
    ]
)


def container_metadata(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, container, duration_ms, bitrate_kbps, sample_rate,
    channels, n_frames, n_tracks, brand) for MP3 / MP4 payloads.

    Dispatch SNIFFS the bytes (sync word / ID3 / box walk) rather than
    trusting the mime column — at corpus scale mime labels lie. Map-only
    mapInPandas: payload bytes cross Arrow once, no shuffle; scales as
    a pure scan at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CONTAINER_SCHEMA.fields]
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                meta = parse_mp3(b)
                if meta is not None:
                    out.append(
                        (
                            int(mid), "mp3", meta["duration_ms"],
                            meta["bitrate_kbps"], meta["sample_rate"],
                            meta["channels"], meta["n_frames"], None, None,
                        )
                    )
                    continue
                m4 = parse_mp4(b)
                if m4 is not None:
                    out.append(
                        (
                            int(mid), "mp4", m4["duration_ms"], None, None,
                            None, None, m4["n_tracks"], m4["brand"],
                        )
                    )
                    continue
                if strict:
                    raise NotImplementedError(
                        "unrecognized media container (not MPEG audio / "
                        "ISO-BMFF); see datapipe.containers"
                    )
                out.append((int(mid), None, None, None, None, None, None, None, None))
            yield pd.DataFrame(out, columns=cols)

    return media.select("media_id", "payload").mapInPandas(run, CONTAINER_SCHEMA)
