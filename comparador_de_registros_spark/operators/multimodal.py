"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schema, partitioning,
UDF signatures, batch shapes, deterministic outputs. The actual codec
work (image decode, audio resample, video frame extraction) is STUBBED
because the sandbox has no imaging/audio libraries: each stub either
raises ``NotImplementedError`` (real-codec mode) or produces a
deterministic fake derived from the payload bytes (``fake=True``, the
test mode). Swapping in Pillow/torchaudio/PyAV changes only the inner
function body — the Spark plumbing is identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from comparador_de_registros_spark.functions import hashing as H

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("payload_hash", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def generate_fake_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque binary assets for plumbing tests."""
    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                rng = np.random.default_rng(seed ^ (i * 2654435761))
                kind = kinds[i % 3]
                payload = rng.integers(0, 256, size=128 + (i % 64), dtype=np.uint8)
                rows.append(
                    (
                        int(i),
                        kind,
                        payload.tobytes(),
                        64 + i % 32 if kind == "image" else None,
                        48 + i % 16 if kind == "image" else None,
                        1000 + 10 * (i % 100) if kind != "image" else None,
                        {"image": "png", "audio": "wav", "video": "h264"}[kind],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "kind", "payload", "width", "height",
                    "duration_ms", "codec",
                ],
            )

    return spark.range(n).repartition(4).mapInPandas(gen, ASSET_SCHEMA)


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Pillow decode -> normalized grayscale signal. Optional import:
    raises NotImplementedError when Pillow is absent."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real image decoding needs the Pillow codec library"
        ) from e
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.float32).ravel()
    return (arr - 127.5) / 127.5


def _decode_audio_real(payload: bytes) -> np.ndarray:
    """PCM WAV decode via the stdlib ``wave`` module — genuinely real
    (no external codec needed) for 8/16-bit PCM; other containers need
    torchaudio/ffmpeg and raise."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            "audio payload is not PCM WAV; non-WAV containers need a "
            "codec library (torchaudio/ffmpeg)"
        ) from e
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        return (arr - 128.0) / 128.0
    raise NotImplementedError(
        f"unsupported WAV sample width {width} without a codec library"
    )


def _decode_video_real(payload: bytes) -> np.ndarray:
    """PyAV decode -> per-frame grayscale means. Optional import:
    raises NotImplementedError when PyAV is absent."""
    try:
        import av
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real video decoding needs the PyAV codec library"
        ) from e
    import io

    with av.open(io.BytesIO(payload)) as container:  # pragma: no cover
        frames = [
            np.asarray(f.to_ndarray(format="gray"), dtype=np.float32).mean()
            for f in container.decode(video=0)
        ]
    return (np.array(frames, dtype=np.float32) - 127.5) / 127.5  # pragma: no cover


_REAL_DECODERS = {
    "image": _decode_image_real,
    "audio": _decode_audio_real,
    "video": _decode_video_real,
}


def _decode_stub(kind: str, payload: bytes, fake: bool) -> np.ndarray:
    """``fake=True``: deterministic bytes->pseudo-signal (test mode).
    ``fake=False``: REAL decode behind optional imports — PCM WAV via
    stdlib ``wave`` (always available), images via Pillow and video via
    PyAV when installed; a missing codec library raises
    NotImplementedError naming it."""
    if not fake:
        return _REAL_DECODERS[kind](payload)
    # deterministic fake "decode": bytes -> pseudo-signal
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (arr - 127.5) / 127.5


def extract_features(
    assets: DataFrame, fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode (stub) + fixed-size feature extraction per asset.

    The feature is a deterministic bucketed-mean profile of the decoded
    signal — a stand-in with the exact shape a real embedding stage has
    (fixed-dim float vector per asset, Arrow-batched)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload)
                signal = _decode_stub(kind, data, fake)
                buckets = np.array_split(signal, dim)
                feat = np.array(
                    [float(b.mean()) if len(b) else 0.0 for b in buckets],
                    dtype=np.float32,
                )
                rows.append(
                    (
                        int(aid),
                        kind,
                        len(data),
                        H.hash_bytes(data) - (1 << 63),
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "n_bytes", "payload_hash", "feature"],
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        extract, FEATURE_SCHEMA
    )


def sample_video_frames(
    assets: DataFrame, every_ms: int = 500, fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    deterministic frame hash (stub decode)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_ms", T.IntegerType(), False),
            T.StructField("frame_hash", T.LongType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if dur is None or pd.isna(dur):
                    continue
                data = bytes(payload)
                _decode_stub("video", data, fake)
                for ms in range(0, int(dur), every_ms):
                    rows.append(
                        (int(aid), ms, H.hash_bytes(data, seed=ms) - (1 << 63))
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_ms", "frame_hash"]
            )

    return (
        assets.where(F.col("kind") == "video")
        .select("asset_id", "payload", "duration_ms")
        .mapInPandas(sample, schema)
    )
