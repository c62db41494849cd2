"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, partition-preserving batch transforms,
Arrow-vectorized UDF signatures, frame/window sampling over byte ranges —
is real and tested. The codec step itself (JPEG decode, audio resample,
video frame extraction) is STUBBED: the container ships no image/audio
libraries, so ``decode_*`` raise NotImplementedError unless
``fake_codec=True``, which substitutes a deterministic splitmix64-derived
feature vector of the right shape (used by tests and the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketchlib.bitops import U64, splitmix64

MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

_KINDS = np.array(["image", "audio", "video"])


def generate_media_rows(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Deterministic media rows for the given row indices (pure function)."""
    ids = np.asarray(ids, dtype=np.uint64)
    h = splitmix64(ids + U64(seed))
    kind = _KINDS[(h % U64(3)).astype(np.int64)]
    sizes = (256 + (h >> U64(8)) % U64(1024)).astype(np.int64)
    blobs = [
        splitmix64(np.arange(s // 8 + 1, dtype=np.uint64) + U64(int(i)))
        .tobytes()[: int(s)]
        for i, s in zip(ids.tolist(), sizes.tolist())
    ]
    return pd.DataFrame(
        {
            "media_id": ids.astype(np.int64),
            "kind": kind,
            "blob": blobs,
            "width": ((h % U64(640)) + U64(32)).astype(np.int32),
            "height": ((h % U64(480)) + U64(32)).astype(np.int32),
            "sample_rate": np.where(kind == "audio", 16000, 0).astype(np.int32),
            "duration_ms": ((h % U64(10_000)).astype(np.int32)),
        }
    )


def synth_media_table(spark: SparkSession, num_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque media blobs + typed metadata (test fixture)."""

    def gen(iterator):
        for pdf in iterator:
            yield generate_media_rows(pdf["id"].to_numpy(np.uint64), seed)

    return spark.range(0, num_rows, 1, max(spark.sparkContext.defaultParallelism, 4)).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


MEDIA_ROWS = 2_000


def materialized_media_path(num_rows: int = MEDIA_ROWS, seed: int = 42) -> str:
    return f"/tmp/exaloglog_media_{num_rows}_seed{seed}.parquet"


def materialize_media_table(num_rows: int = MEDIA_ROWS, seed: int = 42) -> str:
    """Parquet twin of the deterministic media table for the DuckDB oracle
    (same pattern as ops/tokens.materialize_token_table)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = materialized_media_path(num_rows, seed)
    if os.path.exists(path):
        return path
    pdf = generate_media_rows(np.arange(num_rows, dtype=np.uint64), seed)
    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("blob", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("sample_rate", pa.int32()),
            ("duration_ms", pa.int32()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def _fake_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash the bytes into a
    unit-norm float32 feature vector."""
    raw = np.frombuffer(blob[: (len(blob) // 8) * 8], dtype=np.uint64)
    seedv = splitmix64(raw).sum(dtype=np.uint64) if len(raw) else U64(1)
    h = splitmix64(np.arange(dim, dtype=np.uint64) + seedv)
    v = ((h >> U64(11)).astype(np.float32) * np.float32(2.0**-53)) - np.float32(0.5)
    n = np.linalg.norm(v)
    return v / (n if n > 0 else 1.0)


def decode_and_featurize(
    df: DataFrame, dim: int = 64, fake_codec: bool = False
) -> DataFrame:
    """blob -> feature vector (mapInPandas; batch-shaped like a real
    preprocessing stage: one Arrow batch in, one out, no shuffle)."""

    def run(iterator):
        for pdf in iterator:
            if not fake_codec:
                raise NotImplementedError(
                    "real media codecs are not available in this environment; "
                    "pass fake_codec=True for the deterministic stand-in"
                )
            feats = [_fake_features(bytes(b), dim) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, schema="media_id long, kind string, features array<float>")


def sample_frames(df: DataFrame, frame_bytes: int = 64, stride: int = 4) -> DataFrame:
    """Byte-range 'frame' sampling for video blobs: every ``stride``-th
    frame_bytes-sized window (the real pipeline would seek keyframes; the
    slicing/explode plumbing is identical)."""

    def run(iterator):
        for pdf in iterator:
            rows = {"media_id": [], "frame_no": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                nframes = max(len(b) // frame_bytes, 1)
                for fno in range(0, nframes, stride):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["frame"].append(b[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame(rows)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "blob")
        .mapInPandas(run, schema="media_id long, frame_no int, frame binary")
    )
