"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decoding is STUBBED —
image/audio libraries are not available in this environment, so the
decode kernels either raise NotImplementedError (strict mode) or apply a
deterministic fake decode (test mode). Swapping in PIL/ffmpeg later
changes only the inner kernel function, not the Spark plumbing.

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


def _decode_image_stub(payload: bytes, strict: bool) -> np.ndarray:
    """STUB decode: no imaging libs in this environment.

    strict=True  -> NotImplementedError (production placeholder)
    strict=False -> deterministic fake: bytes -> fixed 8-dim profile
    """
    if strict:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. PIL); "
            "install and replace _decode_image_stub"
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
