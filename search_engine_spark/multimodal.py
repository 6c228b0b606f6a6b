"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media ride through the engine as opaque ``binary`` payload columns with
typed metadata — the same pattern as our posting-chunk payloads. The
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas operators,
partition sizing) is real and tested; the pixel/sample decode step is
STUBBED because the sandbox has no image/audio libraries:

* ``decoder="stub"`` (default) raises NotImplementedError, telling the
  caller which library hook to install.
* ``decoder="fake"`` substitutes a deterministic md5-driven decode so
  the full pipeline (including downstream feature math) is testable.

At scale the payload column dominates row size — operators here always
select only (id, payload[, metadata]) so Parquet column pruning keeps
text-only queries from ever reading media bytes, and
``spark.sql.files.maxPartitionBytes`` governs task sizing of media scans.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, out_len: int) -> np.ndarray:
    """Deterministic stand-in decode: an md5 HEX-STRING keystream ->
    float array in [0, 1). Block ``b``'s 16 bytes are the hex-pair
    values of ``md5("<payload.hex()>:<b>")``. Every intermediate value
    is an ASCII string (never raw digest bytes), so the exact stream
    is reproducible in any engine whose md5() takes strings — the
    DuckDB contract oracle (``multimodal_features``) recomputes it in
    SQL. Stable across engines/platforms."""
    if payload is None:
        payload = b""
    key = payload.hex()
    vals: list[int] = []
    b = 0
    while len(vals) < out_len:
        h = hashlib.md5(f"{key}:{b}".encode()).hexdigest()
        vals.extend(int(h[j : j + 2], 16) for j in range(0, 32, 2))
        b += 1
    return np.array(vals[:out_len], dtype=np.float64) / 256.0


def decode_media(payload: bytes, media_type: str, decoder: str = "stub") -> np.ndarray:
    """Decode payload bytes to a sample array.

    ``stub``: the real hook — plug PIL/libav here. Raises
    NotImplementedError in this environment (no media libs installed).
    ``fake``: deterministic md5 keystream (tests/pipeline plumbing).
    """
    if decoder == "fake":
        return _fake_decode(payload, 64)
    raise NotImplementedError(
        "media decode requires an image/audio library (PIL/torchaudio/"
        "libav) not present in this environment; pass decoder='fake' for "
        "the deterministic test decode"
    )


def extract_features(
    media: DataFrame, decoder: str = "stub", feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """(media_id, media_type, n_bytes, features:array<double>) via an
    Arrow-batched mapInPandas — one decode per row, vectorized feature
    pooling per batch."""

    def run(batches):
        for pdf in batches:
            ids, types, nbytes, feats = [], [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                samples = decode_media(payload, mtype, decoder=decoder)
                if len(samples) < feature_dim:
                    # short clip: zero-pad to one feature row instead
                    # of pooling an EMPTY reshape into a silent all-NaN
                    # vector (mean over zero rows)
                    samples = np.pad(
                        samples, (0, feature_dim - len(samples))
                    )
                pooled = samples[: (len(samples) // feature_dim) * feature_dim]
                pooled = pooled.reshape(-1, feature_dim).mean(axis=0)
                ids.append(mid)
                types.append(mtype)
                nbytes.append(len(payload) if payload is not None else 0)
                feats.append(np.round(pooled, 6).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "n_bytes": nbytes,
                    "features": feats,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run,
        "media_id long, media_type string, n_bytes long, "
        "features array<double>",
    )


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    decoder: str = "stub",
) -> DataFrame:
    """(media_id, frame_idx, frame_ts_ms, frame:binary) — sample one
    frame per ``every_ms`` of video duration. Frame extraction itself is
    the stubbed decode; the row fan-out, timestamps and binary plumbing
    are real."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = int(dur) if pd.notna(dur) else 0
                # ONE decode per video, reused for every sampled frame
                # (the decode does not depend on the timestamp; with a
                # real decoder hook this was a full re-decode per frame)
                samples = decode_media(payload, "video", decoder=decoder)
                frame = (samples * 255).astype(np.uint8).tobytes()
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows.append((mid, i, ts, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, "media_id long, frame_idx int, frame_ts_ms long, frame binary"
    )


def synthetic_media(spark, n: int = 32, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table for tests (payload = md5 bytes of
    the id, metadata derived from id)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                i % max(n // 2, 1),
                media_type,
                f"{media_type}/fake",
                bytearray(payload),
                64,
                48,
                3000 + 500 * i,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
