"""Multimodal column plumbing (net-new; BASELINE.json north star).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata and runs decode / feature-extraction / resize / frame-sampling as
Arrow-batched mapInPandas stages. The container ships no image/audio codecs,
so the decode kernels are STUBS — `decode_fn` hooks let a real deployment
plug in PIL/ffmpeg; `deterministic_fake_features` provides a seeded fake so
the Spark-side plumbing (schema, batching, partitioning) is fully testable.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_features",
    "deterministic_fake_features",
    "decode_stub",
]

# canonical media-column schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def decode_stub(payload: bytes, mime_type: str):
    """Placeholder decode kernel. A real deployment swaps in PIL/ffmpeg."""
    raise NotImplementedError(
        "media decoding requires image/audio codecs not present in this "
        "container; pass decode_fn=... with a real decoder"
    )


def deterministic_fake_features(payload: bytes, mime_type: str, dim: int = 16) -> list[float]:
    """Seeded fake feature vector: sha256(payload) -> uniform floats.

    Deterministic across runs/partitions, so tests can hash-check the full
    pipeline without codecs.
    """
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.uniform(-1, 1, dim)]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata columns computed JVM-side (no decode): byte length and
    a content hash for dedup joins."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "content_sha", F.sha2(F.col(payload_col), 256)
    )


def extract_features(
    df: DataFrame,
    decode_fn=deterministic_fake_features,
    payload_col: str = "payload",
    mime_col: str = "mime_type",
    id_col: str = "media_id",
    dim: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction: mapInPandas over (id, payload).

    The schema/batch shape is the real production plumbing; only the kernel
    is swappable. Output: (media_id, features array<double>).
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_fn(p, m, dim) if decode_fn is deterministic_fake_features else decode_fn(p, m)
                for p, m in zip(pdf[payload_col], pdf[mime_col])
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.select(id_col, payload_col, mime_col).mapInPandas(run, schema)
