"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side architecture is real and tested — schema, partition-
preserving ``mapInPandas`` decode stage, Arrow batch shapes, feature
schema. The actual codec call is stubbed (this container has no
image/audio libraries): ``decode_fn`` defaults to a clearly-marked
deterministic fake; pass a real decoder (e.g. PIL/librosa-backed) in
production.

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
    """The production decode hook. Not implemented in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "pass decode_fn=<your decoder> to extract_features()"
    )


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
