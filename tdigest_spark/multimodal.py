"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The actual codec calls are
STUBBED in this container (no PIL/ffmpeg): ``decoder='real'`` raises
``NotImplementedError`` with the exact dependency needed, while
``decoder='fake'`` produces a deterministic feature vector derived from
the payload bytes — so the Spark-side plumbing (schema, batch shapes,
partitioning, UDF signatures) is fully real and tested, and swapping in
a real codec changes one function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_media(df: DataFrame, payload_col: str, media_type: str = "image/fake") -> DataFrame:
    """Wrap a binary column with the typed metadata struct (real decode
    would fill width/height; the stub derives deterministic fakes)."""
    payload = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.pmod(F.xxhash64(payload), F.lit(1920)).cast("int").alias("width"),
            F.pmod(F.xxhash64(payload, F.lit(1)), F.lit(1080)).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decode→embed stage: a dim-length
    float32 vector seeded from the payload bytes."""
    data = np.frombuffer(payload, dtype=np.uint8)
    if data.size == 0:
        return np.zeros(dim, dtype=np.float32)
    reps = int(np.ceil(dim / data.size))
    v = np.tile(data, reps)[:dim].astype(np.float32)
    return (v - v.mean()) / (v.std() + 1e-6)


def decode_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    dim: int = 64,
    decoder: str = "fake",
    result_col: str = "features",
) -> DataFrame:
    """Batch decode→feature-extract over mapInPandas.

    decoder='real' is gated: raises NotImplementedError naming the
    missing dependency (PIL/torchvision not in this container)."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decode requires PIL/torchvision which are not "
            "available in this container; use decoder='fake' for the "
            "deterministic stand-in"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(result_col, ArrayType(FloatType())),
        ]
    )

    def run(batches):
        for pdf in batches:
            feats = [
                None if b is None else _fake_decode_features(bytes(b), dim).tolist()
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), result_col: feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    n_frames: int = 4,
    frame_bytes: int = 256,
) -> DataFrame:
    """Video-style frame sampling: split a binary payload into n evenly
    spaced frame chunks (stub keeps raw bytes; a real impl would call
    ffmpeg).  Output one row per (id, frame_idx, frame_payload)."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_n_bytes", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                data = bytes(b)
                if not data:
                    continue
                step = max(len(data) // n_frames, 1)
                for fidx in range(min(n_frames, len(data))):
                    chunk = data[fidx * step : fidx * step + frame_bytes]
                    ids.append(i)
                    idxs.append(fidx)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_n_bytes": sizes}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)
