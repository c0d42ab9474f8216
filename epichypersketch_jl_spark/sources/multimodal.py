"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched kernels.

The decode step probes for a REAL codec at runtime (Pillow, if the
deployment installs it): `decode_features(..., fake=False)` decodes
payloads as images via PIL and emits a deterministic grayscale-thumbnail
feature vector.  When no codec is installed (this container ships none),
the probe fails and `decode_image` raises NotImplementedError — the
deterministic `_fake_decode` remains the always-available fallback.
Everything around the decode — schema, batching, UDF signatures, frame
sampling, feature extraction shape — is identical on both paths, so the
fake-path tests pin the plumbing the real path rides on.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from ..functions.hashing import splitmix64

_U = np.uint64


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + typed metadata from text
    (stands in for real image bytes; deterministic)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.length(payload).cast("int").alias("n_bytes"),
            (F.pmod(F.xxhash64(text_col), F.lit(3))).cast("int").alias("channels"),
            F.lit("fake/raw").alias("mime"),
        ),
    )


def _fake_decode(blobs: list[bytes], dim: int, seed: int) -> np.ndarray:
    """Deterministic fake 'decoder': hash bytes -> seeded feature vector.

    Stand-in for the real (unavailable) codec path; real decoders would be:
        from PIL import Image  # noqa — not installed in this container
    """
    n = len(blobs)
    out = np.zeros((n, dim), dtype=np.float32)
    if n == 0:
        return out
    import pandas as pd

    h = pd.util.hash_array(np.asarray(blobs, dtype=object), categorize=False).astype(np.uint64)
    # expand each 64-bit hash into `dim` floats via counter-mode splitmix
    with np.errstate(over="ignore"):
        ctr = h[:, None] + np.arange(dim, dtype=np.uint64)[None, :]
        bits = splitmix64(ctr.ravel()).reshape(n, dim)
    out = ((bits >> _U(11)).astype(np.float64) / float(1 << 53)).astype(np.float32)
    return out * 2.0 - 1.0


def _pil_available() -> bool:
    """Runtime probe for a real image codec (Pillow)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _pil_decode(blobs: list[bytes], dim: int, seed: int) -> np.ndarray:
    """Real decode via Pillow: each payload is opened as an image,
    converted to grayscale, resized to a (dim, 1) strip with bilinear
    resampling, and scaled to [-1, 1] — a deterministic, codec-real
    fixed-width feature.  `seed` is unused here (kept for signature
    parity with _fake_decode)."""
    from io import BytesIO

    from PIL import Image

    out = np.zeros((len(blobs), dim), dtype=np.float32)
    for i, b in enumerate(blobs):
        img = Image.open(BytesIO(b)).convert("L").resize((dim, 1), Image.BILINEAR)
        out[i] = np.asarray(img, dtype=np.float32).ravel() / 127.5 - 1.0
    return out


def decode_image(*args, **kwargs):
    """Real codec decode: delegates to Pillow when installed, raises
    NotImplementedError otherwise (this container ships no codecs)."""
    if not _pil_available():
        raise NotImplementedError(
            "no image codec installed (Pillow probe failed); "
            "use decode_features(..., fake=True) for the deterministic stub"
        )
    return _pil_decode(*args, **kwargs)


def decode_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 32,
    seed: int = 42,
    fake: bool = True,
) -> DataFrame:
    """(doc_id, features: array<float>, n_bytes) — Arrow-batched decode +
    feature extraction.  `fake=True` uses the deterministic hash-based
    stand-in; `fake=False` decodes real images via the Pillow probe
    (NotImplementedError when no codec is installed).  Batch shape and
    schema are identical on both paths."""
    if not fake and not _pil_available():
        decode_image()  # raises with the probe message
    decode = _fake_decode if fake else _pil_decode
    src = df.select(id_col, payload_col)
    out_schema = StructType(
        [
            src.schema[id_col],
            StructField("features", ArrayType(FloatType(), False), False),
            StructField("n_bytes", IntegerType(), False),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            blobs = batch.column(payload_col).to_pylist()
            feats = decode(blobs, dim, seed)
            n = feats.shape[0]
            offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
            feat_col = pa.ListArray.from_arrays(
                offs, pa.array(feats.astype(np.float32).ravel())
            )
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: batch.column(id_col),
                    "features": feat_col,
                    "n_bytes": pa.array(
                        np.array([len(b) for b in blobs], dtype=np.int32)
                    ),
                }
            )

    return src.mapInArrow(fn, out_schema)


def sample_frames(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Treat the payload as a 'video': one row per sampled fixed-size frame
    (frame_idx, frame: binary).  The explode happens kernel-side so the
    JVM only ever sees the sampled frames, not the raw stream."""
    src = df.select(id_col, payload_col)
    out_schema = StructType(
        [
            src.schema[id_col],
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", src.schema[payload_col].dataType, False),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            blobs = batch.column(payload_col).to_pylist()
            ids, idxs, frames = [], [], []
            for row, b in enumerate(blobs):
                n_frames = max(1, len(b) // frame_bytes)
                for fi in range(0, n_frames, stride):
                    ids.append(row)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            if not ids:
                continue
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: pc.take(batch.column(id_col), pa.array(ids)),
                    "frame_idx": pa.array(np.array(idxs, dtype=np.int32)),
                    "frame": pa.array(frames, type=pa.binary()),
                }
            )

    return src.mapInArrow(fn, out_schema)
