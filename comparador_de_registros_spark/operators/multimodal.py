"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schema, partitioning,
UDF signatures, batch shapes, deterministic outputs. Codec work in
``fake=False`` mode: PCM WAV decodes via the stdlib ``wave`` module
and PNG via a pure-stdlib zlib+struct decoder (both genuinely real,
zero wheels, executed by the test suite); Pillow (any image format)
and PyAV (video) are optional fast paths behind import guards, and a
payload no available codec handles raises ``NotImplementedError``
naming the missing library. ``fake=True`` produces a deterministic
pseudo-signal from the payload bytes for plumbing tests.
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png_stdlib(payload: bytes) -> np.ndarray:
    """Pure-stdlib (zlib + struct) PNG decode -> 8-bit grayscale 2D
    array. Handles non-interlaced 8-bit-depth gray / gray+alpha / RGB /
    RGBA with all five scanline filters; anything fancier (16-bit,
    palette, Adam7) raises NotImplementedError naming the limitation.
    Color -> gray uses the ITU-R 601 integer luma Pillow's ``.convert
    ("L")`` applies, so the two real paths agree bit-for-bit."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise NotImplementedError("image payload is not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT chunks")
    w, h, depth, color, _comp, _filt, interlace = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or interlace != 0 or channels is None:
        raise NotImplementedError(
            f"stdlib PNG path handles 8-bit non-interlaced gray/RGB/RGBA "
            f"only (depth={depth}, color type={color}, "
            f"interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise NotImplementedError("PNG IDAT stream truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    off = 0
    for y in range(h):
        ftype = raw[off]
        cur = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1).copy()
        off += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up (vectorized; uint8 wraps mod 256)
            cur += prev
        elif ftype == 1:  # Sub — serial prior-pixel dependency
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, channels).astype(np.int32)
    if channels <= 2:  # gray / gray+alpha: first channel is luma
        gray = px[..., 0]
    else:  # ITU-R 601 integer luma, Pillow .convert("L") parity
        gray = (px[..., 0] * 299 + px[..., 1] * 587 + px[..., 2] * 114) // 1000
    return gray.astype(np.uint8)


def encode_png_gray(arr: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 per scanline) —
    lets tests build real, spec-valid PNG payloads without any imaging
    library. Output decodes identically under Pillow and the stdlib
    path."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Image decode -> normalized grayscale signal. Pillow when
    installed (any format it reads); otherwise the pure-stdlib PNG
    path, so the image branch is genuinely executable with no imaging
    wheels at all."""
    import io

    try:
        from PIL import Image
    except ImportError:  # pragma: no cover - env-dependent
        arr = _decode_png_stdlib(payload).astype(np.float32).ravel()
        return (arr - 127.5) / 127.5

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
