"""Multimodal columns (training-data pipeline tier).

Images/audio/video are opaque ``binary`` payloads with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The decode libraries (PIL/torchaudio/ffmpeg) are NOT
in this container, so the codec boundary is stubbed:

- ``decoder='fake'`` (default in tests): deterministic byte-level features
  so the Spark-side plumbing — schema, batch shape, partitioning, UDF
  signature — is real and tested end-to-end;
- ``decoder='real'``: raises NotImplementedError at the exact call site a
  PIL/ffmpeg call would occupy.

At 100 TB payloads live in object storage; the binary column holds either
inline bytes (small) or a URI + byte-range, and the mapInPandas stage
fetches lazily per Arrow batch — the operator surface is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
        StructField("media_id", StringType(), False),
        StructField("doc_id", LongType(), True),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, byte_mean double, "
    "byte_sha256 string, feature_ok boolean"
)


def fake_media_frame(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table: payload = seeded digest-expanded
    bytes, metadata consistent with kind."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        blob = b"".join(
            hashlib.sha256(f"{seed}:{i}:{j}".encode()).digest() for j in range(8)
        )
        rows.append(
            (
                f"M{i:06d}",
                i,
                kind,
                blob,
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                16000 if kind == "audio" else None,
                30 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract stage over the binary column.

    mapInPandas => one Arrow batch per partition slice; the decode happens
    inside the executor, payload bytes never hit the driver.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                if decoder == "real":
                    # exact seam where PIL.Image.open / soundfile.read /
                    # ffmpeg demux would run — libs absent in this container
                    raise NotImplementedError(
                        "real media decoding requires PIL/soundfile/ffmpeg; "
                        "use decoder='fake' for the deterministic test path"
                    )
                payload = bytes(r.payload) if r.payload is not None else b""
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(payload),
                        "byte_mean": (sum(payload) / len(payload)) if payload else 0.0,
                        "byte_sha256": hashlib.sha256(payload).hexdigest(),
                        "feature_ok": bool(payload),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands (media_id, frame_idx) rows
    for every_n-th frame from metadata — the real decoder would seek these
    offsets. Pure relational expansion (sequence/explode), no UDF."""
    from pyspark.sql import functions as F

    vids = df.filter((df.kind == "video") & df.n_frames.isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
