"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched UDFs.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container): `decode_image` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (md5-seeded
dimensions/features) exercises the full Spark path — schema, partitioning,
Arrow batch shapes, UDF signatures — which IS the part that matters for the
engine. Swap the kernel body for PIL/torchvision/ffmpeg on a real cluster.

Layout contract (mirrors how the reference treats BYTES columns as opaque
payloads end-to-end, e.g. BytesColumn element/BytesColumn.java and the
BINARY/BLOB JDBC mapping CommonRdbmsReader.java:397-400):

    media(media_id long, kind string, payload binary,
          meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = md5-stream bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"),
    )
    return df.withColumn(
        "meta",
        F.struct(
            F.concat(F.lit("application/x-fake-"), F.col("kind")).alias("mime"),
            (F.pmod(F.xxhash64("media_id", F.lit("w")), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("media_id", F.lit("h")), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64("media_id", F.lit("d")), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
        ),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel."""
    h = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(h[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(dim)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload -> feature vector via mapInPandas (Arrow batches; the real
    kernel would decode images/frames here — batch shape and schema are
    production-real, the kernel is the stub)."""
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not available in this "
            "container; pass fake=True for the deterministic stand-in kernel"
        )

    def feat(batches):
        for pdf in batches:
            feats = [
                _fake_features(p).tolist() for p in pdf["payload"].to_numpy()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        feat, schema="media_id long, kind string, features array<double>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (timestamp
    offsets from meta.duration_ms via sequence/explode — pure column ops;
    the decode of each planned frame is the stubbed kernel)."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
