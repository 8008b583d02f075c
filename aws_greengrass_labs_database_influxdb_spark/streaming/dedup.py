"""Streaming exact deduplication for continuous document ingest.

A training-data pipeline rarely ingests a static corpus — crawls and
log streams arrive continuously, and the same document shows up again
and again (re-crawls, retries, mirrors). This stage drops exact
duplicates *across micro-batches* with bounded state:

- the dedup key is ``md5(normalized text)`` computed JVM-side (same
  normalization as the batch ``ext.dedup.exact_dedup``, so batch and
  streaming agree on what "duplicate" means);
- ``dropDuplicatesWithinWatermark`` keys the state store by hash and
  expires entries once the watermark passes — state is bounded by
  (arrival rate × watermark horizon), not by corpus size. Plain
  ``dropDuplicates`` on a stream grows state forever; that trap is the
  reason this helper exists.

At 100 TB-scale ingest the state store shards by the hash (uniform by
construction — no skew), and each executor holds only its shard's
recent horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalized_text_hash(text_col: str = "text"):
    """The shared batch/streaming dedup key: md5 over
    whitespace-collapsed, trimmed, lower-cased text."""
    return F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))))


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Drop exact-duplicate documents from a stream.

    ``watermark`` bounds the dedup memory: a duplicate arriving within
    the horizon is dropped; one arriving later than the horizon is a
    re-admittance (the standard at-least-once trade — downstream batch
    dedup catches stragglers). ``watermark=None`` uses unbounded
    ``dropDuplicates`` state — only for tests/finite replays.
    """
    keyed = stream.withColumn("_text_hash", normalized_text_hash(text_col))
    if watermark is not None:
        return keyed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            ["_text_hash"]
        )
    return keyed.dropDuplicates(["_text_hash"])
