"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Decoding is REAL for the formats that
need no codec library: images (P6 PPM, 24-bit BMP — pure numpy — and
non-interlaced 8-bit PNG — stdlib zlib inflate + the five per-row
prediction filters; ``decode_image``) and PCM WAV audio
(``decode_wav``, stdlib ``wave`` + numpy). DCT/entropy formats
(JPEG/MP3/...) and video remain stubbed: those payloads raise
NotImplementedError (strict mode) or yield deterministic fake/NULL
features (test mode).
Swapping in PIL/ffmpeg later changes only the inner kernel function,
not the Spark plumbing.

Layout guidance for 100 TB of media: binary payloads dominate row size,
so ops that don't touch bytes must never scan them — every function
here projects only the columns it needs (column pruning does the rest),
and ``mapInPandas`` with a small ``maxRecordsPerBatch`` keeps Arrow
batches bounded when payloads are MBs each.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),      # images/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),   # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("payload_sha", StringType(), False),
    ]
)


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> (H, W, 3) uint8. Pure numpy —
    no imaging library involved."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    pos += 1  # single whitespace after maxval
    return (
        np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (H, W, 3) uint8
    RGB. Pure numpy: offset/width/height from the header, 4-byte row
    padding, BGR->RGB, bottom-up row order."""
    if not b.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row = ((w * 3 + 3) // 4) * 4
    px = np.frombuffer(b, dtype=np.uint8, count=row * h, offset=off).reshape(
        h, row
    )[:, : w * 3].reshape(h, w, 3)[..., ::-1]
    return (px[::-1] if flip else px).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five per-row PNG prediction filters over one
    filtered sub-image (``h`` rows of ``1 + stride`` bytes)."""
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp] — a
            # per-channel cumulative sum mod 256, fully vectorized
            rec = cur.reshape(-1, bpp).cumsum(axis=0).reshape(-1)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average — left-dependency forces a pixel loop
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] += (left + prev[x]) >> 1
        elif f == 4:  # Paeth
            rec = cur.copy()
            for x in range(stride):
                a = rec[x - bpp] & 0xFF if x >= bpp else 0
                c = prev[x - bpp] & 0xFF if x >= bpp else 0
                p_ = a + prev[x] - c
                pa, pb, pc = abs(p_ - a), abs(p_ - prev[x]), abs(p_ - c)
                if pa <= pb and pa <= pc:
                    rec[x] += a
                elif pb <= pc:
                    rec[x] += prev[x]
                else:
                    rec[x] += c
        else:
            raise ValueError(f"bad PNG filter type {f}")
        rec = rec & 0xFF
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(b: bytes) -> np.ndarray:
    """8-bit PNG (gray / gray+alpha / RGB / RGBA / palette), both
    non-interlaced and Adam7-interlaced -> (H, W, 3) uint8. Pure
    stdlib zlib + numpy — PNG is just deflate (IDAT) plus five per-row
    prediction filters (applied per interlace pass), no codec library
    needed. Alpha is dropped; grayscale broadcasts to 3 channels.
    Raises ValueError on 16-bit / sub-byte depths or malformed
    input."""
    import zlib

    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (ln,) = np.frombuffer(b[pos : pos + 4], dtype=">u4")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + int(ln)]
        if len(data) < int(ln):
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + int(ln)  # len + type + data + crc (crc not verified)
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h = (int(x) for x in np.frombuffer(ihdr[:8], dtype=">u4"))
    depth, color, comp, filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 \
            or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}) — only 8-bit, interlace 0/1"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from None
    bpp = channels
    if interlace == 0:
        stride = w * channels
        if len(raw) != h * (stride + 1):
            raise ValueError("IDAT size mismatch")
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        px = _png_unfilter(arr, h, stride, bpp).reshape(h, w, channels)
    else:  # Adam7: each pass is an independently-filtered sub-image
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = pw * channels
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise ValueError("IDAT size mismatch (interlaced)")
            sub = np.frombuffer(
                raw[off : off + need], dtype=np.uint8
            ).reshape(ph, stride + 1)
            off += need
            rec = _png_unfilter(sub, ph, stride, bpp).reshape(ph, pw, channels)
            px[y0::dy, x0::dx] = rec
        if off != len(raw):
            raise ValueError("IDAT size mismatch (interlaced tail)")
    if color == 3:
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3].copy()  # RGB / RGBA (alpha dropped)


def _png_filter_rows(a: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Apply one PNG filter to every row of a (rows, stride) int64
    sub-image; returns the filtered byte stream (1 + stride per row)."""
    lines = []
    stride = a.shape[1]
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(a.shape[0]):
        cur = a[y]
        left = np.concatenate((np.zeros(bpp, dtype=np.int64), cur[:-bpp]))
        upleft = np.concatenate((np.zeros(bpp, dtype=np.int64), prev[:-bpp]))
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p_ = left + prev - upleft
            pa, pb, pc = np.abs(p_ - left), np.abs(p_ - prev), np.abs(p_ - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    return (
        np.array([len(data)], dtype=">u4").tobytes() + typ + data
        + np.array([crc], dtype=">u4").tobytes()
    )


def encode_png(
    arr: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """(H, W, C) or (H, W) uint8 -> 8-bit PNG bytes with every row
    carrying ``filter_type`` (0..4); ``interlace=True`` emits Adam7
    (each pass an independently-filtered sub-image). Test/synthesis
    helper; filters are applied by their spec definition, so a
    round-trip exercises decode_png's inverse of each filter and pass
    path."""
    import zlib

    h, w = arr.shape[:2]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    px = arr.reshape(h, w, channels).astype(np.int64)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            a = sub.reshape(sub.shape[0], sub.shape[1] * channels)
            parts.append(_png_filter_rows(a, channels, filter_type))
        body = b"".join(parts)
    else:
        body = _png_filter_rows(
            px.reshape(h, w * channels), channels, filter_type
        )
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = (
        np.array([w, h], dtype=">u4").tobytes()
        + bytes([8, color, 0, 0, int(interlace)])
    )
    return (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(H, W) uint8 palette indices + (N, 3) palette -> color-type-3
    PNG (test/synthesis helper for decode_png's palette path)."""
    import zlib

    h, w = idx.shape
    a = idx.astype(np.int64)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(_png_filter_rows(sub, 1, 0))
        body = b"".join(parts)
    else:
        body = _png_filter_rows(a, 1, 0)
    ihdr = (
        np.array([w, h], dtype=">u4").tobytes()
        + bytes([8, 3, 0, 0, int(interlace)])
    )
    return (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 PPM bytes (test/synthesis helper)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray | None:
    """Sniff + decode the natively-supported formats (P6 PPM, 24-bit
    BMP, 8-bit PNG incl. palette and Adam7 interlace, baseline +
    progressive JPEG); None for anything else (16-bit PNG,
    arithmetic-coded JPEG, ...)."""
    if payload.startswith(b"\xff\xd8"):
        from orama_spark.datapipe.jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except ValueError:
            return None
    if payload.startswith(_PNG_SIG):
        try:
            return decode_png(payload)
        except ValueError:
            return None
    if payload.startswith(b"P6"):
        # same malformed-payload contract as the BMP branch: arbitrary
        # binary starting with b"P6" must yield None, not blow up the
        # whole extract_features job
        try:
            return decode_ppm(payload)
        except ValueError:
            return None
    if payload.startswith(b"BM"):
        try:
            return decode_bmp(payload)
        except ValueError:
            return None
    return None


def _image_profile(arr: np.ndarray) -> np.ndarray:
    """Deterministic 8-dim profile of a decoded image: dims + channel
    means + gray stats, all scaled to ~[0, 1] except dims."""
    gray = arr.astype(np.float32).mean(axis=2)
    return np.array(
        [
            float(arr.shape[0]),
            float(arr.shape[1]),
            float(arr[..., 0].mean()) / 255.0,
            float(arr[..., 1].mean()) / 255.0,
            float(arr[..., 2].mean()) / 255.0,
            float(gray.std()) / 255.0,
            float(gray.min()) / 255.0,
            float(gray.max()) / 255.0,
        ],
        dtype=np.float32,
    )


def _decode_image_stub(payload: bytes, strict: bool) -> np.ndarray:
    """Decode kernel: REAL pure-numpy decode for P6 PPM, 24-bit BMP,
    non-interlaced 8-bit PNG (stdlib zlib inflate + the five per-row
    filters) and JPEG — baseline AND progressive SOF2 (Huffman + IDCT,
    orama_spark.datapipe.jpeg); arithmetic-coded JPEG / 16-bit PNG /
    exotic formats remain out.

    strict=True  -> NotImplementedError for undecodable payloads
    strict=False -> deterministic fake profile for undecodable payloads
    """
    arr = decode_image(payload or b"")
    if arr is not None:
        return _image_profile(arr)
    if strict:
        raise NotImplementedError(
            "undecodable image payload: arithmetic-coded/12-bit JPEG, "
            "16-bit PNG etc. require a codec library (e.g. PIL); "
            "PPM/BMP/PNG/baseline+progressive-JPEG decode natively — "
            "see decode_image"
        )
    h = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(h[:32], dtype=np.uint8)[:8].astype(np.float32) / 255.0)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata pass that provably never touches payload bytes: the
    projection prunes the binary column at the parquet scan."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.coalesce(F.col("width"), F.lit(0)).alias("width"),
        F.coalesce(F.col("height"), F.lit(0)).alias("height"),
        (F.coalesce(F.col("width"), F.lit(0)) * F.coalesce(F.col("height"), F.lit(0))).alias("pixels"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, payload_sha) — JVM-side length + sha2."""
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


def extract_features(
    media: DataFrame, strict: bool = False, batch_rows: int = 64
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves payload bytes in bounded batches; the inner kernel is
    the only thing to replace when real decoders are available."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                feats.append(_decode_image_stub(b, strict).tolist())
                shas.append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "payload_sha": shas}
            )

    out_media = media.select("media_id", "payload")
    return out_media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms) into
    (media_id, frame_ts_ms) rows WITHOUT touching payloads — the decode
    of each sampled frame is a later mapInPandas over a payload join.
    Pure sequence/explode expressions."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media_df(spark, n_rows: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded
    bytes; metadata consistent with kind)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = kinds[i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": bytes(h * 4),
                "width": 64 + (h[0] % 64) if kind != "audio" else None,
                "height": 64 + (h[1] % 64) if kind != "audio" else None,
                "duration_ms": 1000 + h[2] * 37 if kind != "image" else None,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", FloatType(), True),
        StructField("zero_crossing_rate", FloatType(), True),
        StructField("peak", FloatType(), True),
    ]
)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PCM WAV -> (sample_rate, n_channels, float32 samples in [-1, 1],
    channel-averaged). Stdlib ``wave`` + numpy — no codec library.
    Raises on non-PCM / compressed WAV."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sw = w.getsampwidth()
        if sw not in (1, 2, 4):
            raise ValueError(f"unsupported sample width {sw}")
        raw = w.readframes(w.getnframes())
        rate, ch = w.getframerate(), w.getnchannels()
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        dt = np.int16 if sw == 2 else np.int32
        x = np.frombuffer(raw, dtype=dt).astype(np.float32) / float(
            2 ** (8 * sw - 1)
        )
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return rate, ch, x


def extract_audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas audio features over PCM-WAV payloads: sample rate,
    duration, RMS, zero-crossing rate, peak. Undecodable payloads
    (MP3/AAC/... — codec libs absent) raise in strict mode, else yield
    NULL features. Map-only; payload bytes move once through Arrow."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    rate, ch, x = decode_wav(b)
                except Exception:
                    if strict:
                        raise NotImplementedError(
                            "compressed audio needs a codec library; "
                            "PCM WAV decodes natively — see decode_wav"
                        )
                    out.append((mid, None, None, None, None, None, None, None))
                    continue
                n = int(x.shape[0])
                zc = (
                    float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    / max(n - 1, 1)
                )
                out.append(
                    (
                        mid, int(rate), int(ch), n,
                        int(round(1000.0 * n / rate)) if rate else None,
                        float(np.sqrt(np.mean(x * x))) if n else 0.0,
                        zc,
                        float(np.abs(x).max()) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )
