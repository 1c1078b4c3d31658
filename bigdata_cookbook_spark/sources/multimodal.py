"""Multimodal columns (training-data pipeline tier).

Images/audio/video are opaque ``binary`` payloads with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. Two decoder tiers share one operator surface:

- ``decoder='fake'`` (default in tests): deterministic byte-level features
  so the Spark-side plumbing — schema, batch shape, partitioning, UDF
  signature — is real and tested end-to-end regardless of codec libs;
- ``decoder='real'``: actual codec dispatch per kind. Audio decodes WAV
  via the stdlib ``wave`` module (zero dependencies — tested live in this
  container); image needs Pillow and video needs PyAV/ffmpeg, both
  optional-import gated at the exact call site with a pip hint (the same
  gating pattern as llm/openai_backend.py) — absent libs raise
  ImportError, never a silent fallback.

Real-decoder features are computed over the DECODED sample/pixel bytes
(so two different encodings of the same audio agree), fake-decoder
features over the raw payload bytes.

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


def wav_media_frame(spark: SparkSession, n: int = 12, seed: int = 5) -> DataFrame:
    """Media table whose payloads are REAL (decodable) WAV files: 16-bit
    mono PCM sine-ish tones synthesized via the stdlib ``wave`` writer.
    This is the live fixture for ``decoder='real'`` — no codec libs
    needed to produce or decode it."""
    import io
    import math
    import wave

    rows = []
    for i in range(n):
        sr = 8000
        n_samples = 400 + 40 * (i % 5)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            freq = 200.0 + 50.0 * ((seed + i) % 7)
            pcm = b"".join(
                int(12000 * math.sin(2 * math.pi * freq * t / sr)).to_bytes(
                    2, "little", signed=True
                )
                for t in range(n_samples)
            )
            w.writeframes(pcm)
        rows.append((f"W{i:06d}", i, "audio", buf.getvalue(), None, None, sr, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_real(kind: str, payload: bytes) -> bytes:
    """Codec dispatch for decoder='real': returns the decoded raw
    sample/pixel bytes. Audio = stdlib wave (WAV PCM, no deps); image =
    Pillow, video = PyAV — both optional-import gated with a pip hint."""
    import io

    if kind == "audio":
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            return w.readframes(w.getnframes())
    if kind == "image":
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - container lacks Pillow
            raise ImportError(
                "real image decoding requires Pillow (pip install pillow); "
                "use decoder='fake' for the dependency-free test path"
            ) from e
        img = Image.open(io.BytesIO(payload))
        img.load()
        return img.tobytes()
    if kind == "video":
        try:
            import av
        except ImportError as e:  # pragma: no cover - container lacks PyAV
            raise ImportError(
                "real video decoding requires PyAV/ffmpeg (pip install av); "
                "use decoder='fake' for the dependency-free test path"
            ) from e
        with av.open(io.BytesIO(payload)) as container:  # pragma: no cover
            return b"".join(
                frame.to_ndarray(format="rgb24").tobytes()
                for frame in container.decode(video=0)
            )
    raise ValueError(f"unknown media kind {kind!r} (expected image|audio|video)")


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract stage over the binary column.

    mapInPandas => one Arrow batch per partition slice; the decode happens
    inside the executor, payload bytes never hit the driver. With
    decoder='real' the stats are over DECODED sample/pixel bytes; with
    decoder='fake' over the raw payload bytes (plumbing tier).
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                data = (
                    _decode_real(r.kind, payload)
                    if decoder == "real" and payload
                    else payload
                )
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(data),
                        "byte_mean": (sum(data) / len(data)) if data else 0.0,
                        "byte_sha256": hashlib.sha256(data).hexdigest(),
                        "feature_ok": bool(data),
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
