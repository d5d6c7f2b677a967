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
    "clip_stub_features",
    "decode_stub",
    "codec_available",
    "decode_image_features",
    "resolve_decoder",
    "resize_images",
    "resize_image_payload",
    "deterministic_fake_resize",
    "sample_frames",
    "deterministic_fake_frame",
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


def codec_available(kind: str = "image") -> bool:
    """Runtime codec detection — the self-upgrade gate. Called on each
    worker (not once on the driver) so heterogeneous clusters pick the right
    kernel per executor."""
    if kind == "image":
        try:
            import PIL.Image  # noqa: F401

            return True
        except ImportError:
            return False
    return False


def decode_image_features(payload: bytes, mime_type: str, dim: int = 16) -> list[float]:
    """REAL image kernel (runs whenever PIL is importable): decode the
    payload, convert to grayscale, resize to a sqrt(dim)-sided grid and emit
    normalized pixel intensities — a genuine content-derived feature vector
    with the same (payload, mime, dim) -> list[float] contract as the fake."""
    import io

    from PIL import Image

    side = max(1, int(dim**0.5))
    img = Image.open(io.BytesIO(payload)).convert("L").resize((side, side))
    arr = np.asarray(img, dtype=np.float64).ravel() / 255.0
    out = np.zeros(dim)
    out[: min(dim, arr.size)] = arr[:dim]
    return [float(v) for v in out]


def resolve_decoder(kind: str = "image"):
    """The self-upgrading default: the real PIL kernel when codecs are
    present, the deterministic fake otherwise. Resolved lazily inside the
    Arrow batch loop so the decision is made on the executing worker."""
    return decode_image_features if codec_available(kind) else deterministic_fake_features


def deterministic_fake_features(payload: bytes, mime_type: str, dim: int = 16) -> list[float]:
    """Seeded fake feature vector: sha256(payload) -> uniform floats.

    Deterministic across runs/partitions, so tests can hash-check the full
    pipeline without codecs.
    """
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.uniform(-1, 1, dim)]


def clip_stub_features(payload: bytes, mime_type: str, dim: int = 8) -> list[float]:
    """CLIP-stand-in embedding kernel whose output is EXACT cross-engine
    (r13): component j = sha256(payload || str(j)) first 24 bits, centered
    at 2^23 — an integer-valued double, so downstream sums (centroids,
    distances) are order-free exact and a DuckDB oracle can replay the full
    embed -> join -> retrieve pipeline bit-for-bit
    (``('0x' || substr(sha256(text || 'j'), 1, 6))::BIGINT - 8388608``).

    Same (payload, mime, dim) -> list[float] contract as
    ``deterministic_fake_features``; a real deployment swaps in an actual
    CLIP encoder and every downstream stage (ANN, semantic dedup, centroid
    retrieval) is kernel-agnostic. |v_j| < 2^23 keeps v_j^2 < 2^46 and
    per-source sums over ~2^20 docs < 2^44 — all inside the 2^53 exact
    double window at any realistic corpus scale.
    """
    out = []
    base = payload or b""
    for j in range(dim):
        h = hashlib.sha256(base + str(j).encode()).hexdigest()
        out.append(float(int(h[:6], 16) - (1 << 23)))
    return out


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
    is swappable. ``decode_fn=None`` engages the self-upgrade gate: each
    worker resolves the real PIL kernel when codecs are importable there and
    the deterministic fake otherwise. Output: (media_id, features
    array<double>).
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def run(batches):
        import pandas as pd

        fn = decode_fn if decode_fn is not None else resolve_decoder()
        dim_aware = fn in (
            deterministic_fake_features, decode_image_features, clip_stub_features
        )
        for pdf in batches:
            feats = [
                fn(p, m, dim) if dim_aware else fn(p, m)
                for p, m in zip(pdf[payload_col], pdf[mime_col])
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.select(id_col, payload_col, mime_col).mapInPandas(run, schema)


def resize_image_payload(payload: bytes, mime_type: str, width: int, height: int) -> bytes:
    """REAL resize kernel (runs whenever PIL is importable): decode, resize,
    re-encode as PNG. Same (payload, mime, w, h) -> bytes contract as the
    fake, so pipelines are kernel-agnostic."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).resize((int(width), int(height)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def deterministic_fake_resize(payload: bytes, mime_type: str, width: int, height: int) -> bytes:
    """Codec-free stand-in: a seeded digest stream of width*height bytes.
    Deterministic in (payload, w, h) so tests hash-check the plumbing."""
    n = max(1, int(width) * int(height))
    h = hashlib.sha256((payload or b"") + f":{width}x{height}".encode())
    out = bytearray()
    block = h.digest()
    while len(out) < n:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    return bytes(out[:n])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resize_fn=None,
    payload_col: str = "payload",
    mime_col: str = "mime_type",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched image resize: (media_id, payload, width, height).

    ``resize_fn=None`` engages the per-worker self-upgrade gate (real PIL
    kernel when importable, deterministic fake otherwise) — the same
    contract as ``extract_features``.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
        ]
    )

    def run(batches):
        import pandas as pd

        fn = resize_fn
        if fn is None:
            fn = resize_image_payload if codec_available("image") else deterministic_fake_resize
        for pdf in batches:
            out = [
                fn(p, m, width, height)
                for p, m in zip(pdf[payload_col], pdf[mime_col])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": out,
                    "width": [int(width)] * len(pdf),
                    "height": [int(height)] * len(pdf),
                }
            )

    return df.select(id_col, payload_col, mime_col).mapInPandas(run, schema)


def deterministic_fake_frame(payload: bytes, ts_ms: int) -> bytes:
    """Codec-free frame stand-in: sha256(payload || ts) digest bytes."""
    return hashlib.sha256((payload or b"") + f"@{int(ts_ms)}".encode()).digest()


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    frame_fn=None,
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.

    (media_id, frame_idx, ts_ms, frame). Timestamps are 0, every_ms, ... up
    to duration_ms, capped at max_frames. The fan-out happens inside the
    Arrow batch (no pre-explode shuffle); a real deployment passes
    ``frame_fn`` wrapping ffmpeg/PyAV seek+decode — the container has no
    video codecs, so the default is the deterministic fake.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches):
        import pandas as pd

        fn = frame_fn if frame_fn is not None else deterministic_fake_frame
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, p, dur in zip(pdf[id_col], pdf[payload_col], pdf[duration_col]):
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                n = min(max_frames, max(1, -(-dur // int(every_ms)) if dur > 0 else 1))
                for i in range(n):
                    ts = i * int(every_ms)
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(fn(p, ts))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select(id_col, payload_col, duration_col).mapInPandas(run, schema)
