"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side architecture is real and tested — schema, partition-
preserving ``mapInPandas`` decode stage, Arrow batch shapes, feature
schema. Decoding itself is real for WAV/PCM audio (``wave``),
uncompressed BMP images (``struct`` + numpy), **baseline JPEG**
(pure-numpy decoder, :mod:`.jpeg` — r5), **PNG** (stdlib-zlib
decoder, :mod:`.png` — r5), and **MJPEG-AVI video** (RIFF container
walk + per-frame JPEG decode, :mod:`.avi` — r5, incl. real frame
sampling via :func:`sample_frames_decoded`) via
:func:`stdlib_decode`; stubbed only for the remaining compressed
codecs (MP3, inter-frame video like H.264), where ``decode_fn``
defaults to a
clearly-marked deterministic fake; pass a PIL/librosa-backed decoder
in production. r6 closed two more profiles for real: progressive
JPEG (:mod:`.jpeg` — SOF2 spectral selection + successive
approximation) and interlaced/16-bit PNG (:mod:`.png` — Adam7
passes, high-byte 16-bit transform).

Design for 100 TB: decode runs inside ``mapInPandas`` so bytes never
leave executors; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set lower for large
blobs); downstream feature columns are small and columnar.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_crc32", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(content: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder/feature extractor.

    STUB — replace with a real codec in production. Produces an 8-dim
    feature derived from the byte stream so tests can assert exact
    plumbing behavior.
    """
    if content is None:
        return []
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:8]]


def real_decode_unavailable(content: bytes, kind: str) -> list[float]:
    """The production decode hook for the remaining compressed codecs
    (MP3/H.264). Sample decode is not implemented in this container —
    see :func:`stdlib_decode` for the formats that ARE really decoded
    here (WAV, BMP, baseline+progressive JPEG, PNG incl. Adam7/16-bit
    and 1/2/4-bit). The header/metadata layer for MP3 and H.264 IS
    real: :mod:`.codec_meta` parses frames/SPS exactly (duration,
    sample rate, resolution, bitrate) without decoding samples."""
    raise NotImplementedError(
        "compressed-codec libraries are not installed in this environment; "
        "pass decode_fn=<your decoder> to extract_features()"
    )


def decode_wav(content: bytes) -> tuple[dict, "np.ndarray"]:
    """REAL audio decode: RIFF/WAV PCM via the ``wave`` stdlib module.

    Returns ``(meta, samples)`` where meta has ``channels /
    sample_rate / n_frames / duration_ms / sample_width`` and samples
    is a mono float64 array in [-1, 1] (channels averaged).
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as w:
        ch, width, rate, n = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        raw = w.readframes(n)
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit: pad each 3-byte frame to 4
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32))
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / float(1 << 23)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    meta = {
        "channels": ch,
        "sample_rate": rate,
        "n_frames": n,
        "duration_ms": int(n * 1000 / rate) if rate else 0,
        "sample_width": width,
    }
    return meta, x


def decode_bmp(content: bytes) -> tuple[dict, "np.ndarray"]:
    """REAL image decode: uncompressed 24/32-bit BMP via ``struct`` +
    numpy (no codec library needed — BMP is a raw pixel dump).

    Returns ``(meta, pixels)`` with pixels as a ``(h, w, 3)`` uint8
    RGB array (BMP stores BGR bottom-up with 4-byte row padding —
    both undone here).
    """
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        rows = rows[::-1]
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    meta = {"width": w, "height": h, "bpp": bpp}
    return meta, np.ascontiguousarray(rgb)


def resize_nearest(pixels: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resize of an ``(h, w, c)`` array — pure numpy
    index arithmetic, the real thumbnail step for the BMP path."""
    import numpy as np

    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return pixels[yi][:, xi]


def stdlib_decode(content: bytes, kind: str) -> list[float]:
    """REAL decoder/feature extractor for stdlib-parseable formats.

    - ``audio`` + RIFF/WAV magic → :func:`decode_wav`; feature = 8
      per-segment RMS energies (the standard cheap audio fingerprint).
    - ``image`` + BMP magic → :func:`decode_bmp`, ``image`` + JPEG
      magic → the pure-numpy decoder (:mod:`.jpeg`, r5; progressive
      SOF2 support r6),
      ``image`` + PNG magic → the stdlib-zlib decoder (:mod:`.png`,
      r5) — all feed a 4×4 grayscale thumbnail via
      :func:`resize_nearest`, normalized to [0, 1] — a real
      perceptual-hash-style feature.
    - anything else (MP3, non-MJPEG video) raises — the remaining
      compressed codecs are the documented stub; see
      :func:`real_decode_unavailable`.
    """
    import numpy as np

    if content is None:
        return []
    if kind == "audio" and content[:4] == b"RIFF":
        _, x = decode_wav(content)
        if len(x) == 0:
            return [0.0] * 8
        segs = np.array_split(x, 8)
        return [float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in segs]
    if kind == "video" and content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        # MJPEG-AVI (r5): real container walk + first-frame JPEG decode
        from .avi import parse_avi
        from .jpeg import decode_jpeg

        _, frames = parse_avi(content)
        if not frames:
            return [0.0] * 16
        _, rgb = decode_jpeg(frames[0])
        gray = rgb.astype(np.float64).mean(axis=2)
        thumb = resize_nearest(gray[:, :, None], 4, 4)[:, :, 0]
        return [float(v) / 255.0 for v in thumb.ravel()]
    if kind == "image" and (
        content[:2] == b"BM"
        or content[:2] == b"\xff\xd8"
        or content[:8] == b"\x89PNG\r\n\x1a\n"
    ):
        if content[:2] == b"BM":
            _, rgb = decode_bmp(content)
        elif content[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            _, rgb = decode_jpeg(content)
        else:
            from .png import decode_png

            _, rgb = decode_png(content)
        gray = rgb.astype(np.float64).mean(axis=2)
        thumb = resize_nearest(gray[:, :, None], 4, 4)[:, :, 0]
        return [float(v) / 255.0 for v in thumb.ravel()]
    return real_decode_unavailable(content, kind)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] = fake_decode,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode/feature-extract stage: binary column → feature vectors.

    Runs in ``mapInPandas`` — Arrow-batched, executor-side, partition
    preserving. ``decode_fn`` is called per blob; failures null the
    feature rather than kill the batch (corrupt-blob tolerance matters
    at 10⁹-object scale).
    """
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"]
                try:
                    feat = decode_fn(content, r["kind"])
                except NotImplementedError:
                    raise
                except Exception:
                    feat = None
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(content) if content is not None else 0,
                        "content_crc32": zlib.crc32(content) if content is not None else 0,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (decode stubbed; the explode/plumbing is real).

    The frame grid derives from ``meta.duration_ms`` JVM-side; actual
    frame extraction would happen in a follow-up mapInPandas decode.
    """
    grid = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(grid))
        .select("media_id", "frame_ms", "meta")
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def sample_frames_decoded(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """REAL frame sampling for MJPEG-AVI videos: walk the RIFF
    container, pick the frame at-or-before each ``every_ms`` grid
    point (``idx = floor(ms*1000 / us_per_frame)``),
    decode it with the pure-numpy JPEG decoder, and emit its 4×4
    grayscale-thumbnail feature — one row per sampled frame.

    Runs in ``mapInPandas`` (Arrow-batched, executor-side; bytes never
    reach the driver). Non-AVI video rows and corrupt blobs yield a
    null-feature row per grid point rather than killing the batch.
    The JVM-side grid/explode plan in :func:`sample_frames` remains
    the metadata-only (no-decode) variant.
    """
    import numpy as np
    import pandas as pd

    from .avi import AviError, parse_avi
    from .jpeg import decode_jpeg

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"]
                duration = (r["meta"]["duration_ms"]
                            if r["meta"] is not None else None)
                frames, us_pf = [], None
                if content is not None:
                    try:
                        meta, frames = parse_avi(bytes(content))
                        us_pf = meta["us_per_frame"] or 100_000
                        duration = meta["duration_ms"]
                    except Exception:  # non-AVI/corrupt → null features
                        frames = []
                for ms in range(0, max(int(duration or 0), 1), every_ms):
                    feat = None
                    idx = None
                    if frames and us_pf:
                        idx = min(int(ms * 1000 // us_pf), len(frames) - 1)
                        try:
                            _, rgb = decode_jpeg(frames[idx])
                            gray = rgb.astype(np.float64).mean(axis=2)
                            thumb = resize_nearest(gray[:, :, None], 4, 4)[:, :, 0]
                            feat = [float(v) / 255.0 for v in thumb.ravel()]
                        except Exception:
                            feat = None
                    rows.append(
                        {"media_id": r["media_id"], "frame_ms": ms,
                         "frame_idx": idx, "feature": feat}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )
