"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The decode kernels themselves are STUBBED
(no image/audio libs in this container) behind deterministic fakes
clearly marked below — the Spark-side plumbing (schema, batching,
partition sizing, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark: SparkSession, n: int = 256, seed: int = 5) -> DataFrame:
    """Deterministic fake media table.

    The payload is the ASCII sha256 hexdigest of ``"{seed}|{i}"`` repeated
    ``17 + i % 13`` times — still an opaque ``binary`` column on the Spark
    side, but reproducible in ANSI SQL (``repeat(sha256(...), k)``) so the
    driver's DuckDB oracle can check the feature-extraction output
    end-to-end despite the decode kernel being stubbed in this container.
    """
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                h = hashlib.sha256(f"{seed}|{i}".encode()).hexdigest().encode()
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": h * (17 + int(i) % 13),
                        "meta": {
                            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                            "width": 64 + int(i) % 512 if kind != "audio" else None,
                            "height": 64 + (int(i) * 7) % 512 if kind != "audio" else None,
                            "duration_ms": (1000 + int(i) * 37) % 60000 if kind != "image" else None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    # partition count scales with n (one Arrow batch ~64 rows per task)
    # instead of defaultParallelism: for a small synthetic table this
    # avoids spinning up 32 Python workers for 8 rows each
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 64))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image(payload: bytes, meta) -> np.ndarray:
    """STUB: real impl would be PIL/libjpeg decode -> HxWx3 uint8.
    Deterministic fake keeps the pipeline testable without image libs."""
    # NotImplementedError would be raised here for real decode needs;
    # the deterministic fake derives a tiny "pixel" array from the bytes.
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch at a time, constant
    memory per task; at 100 TB the input is repartitioned so each task
    holds O(batch) payload bytes, never the whole partition.

    The identity columns (payload sha256, byte length) are computed
    JVM-side with ``F.sha2``/``F.length`` BEFORE the Python kernel — at
    100 TB of media that hashing must never ride the Arrow round-trip.
    The kernel computes only ``features`` (the genuinely-Python decode,
    stubbed in this container) and passes the identity columns through."""
    prepped = media.select(
        F.col("media_id").cast("long").alias("media_id"),
        "kind",
        F.lower(F.sha2(F.coalesce(F.col("payload"), F.lit(b"")), 256)).alias(
            "payload_sha256"
        ),
        F.coalesce(F.length("payload"), F.lit(0)).cast("int").alias("n_bytes"),
        "payload",
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].map(lambda p: bytes(p) if p is not None else b"")
            vecs = [_decode_image(p, None) for p in payloads]  # stubbed kernel
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": pdf["payload_sha256"],
                    "n_bytes": pdf["n_bytes"],
                    "features": [(v[:16] / 255.0).tolist() for v in vecs],
                }
            )

    return prepped.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode timestamps natively (the decode
    of each frame would be a mapInPandas kernel like extract_features)."""
    return (
        media.where(F.col("kind") == "video")
        # duration-less media yields NO frames (a coalesce-to-0 would emit
        # one phantom frame at t=0 for every such row)
        .where(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
