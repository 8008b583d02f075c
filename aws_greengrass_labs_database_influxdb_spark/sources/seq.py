"""Shared ingest-sequence allocation for every write path.

LWW (last-write-wins) resolves duplicate (series, time_ns, field)
points by ``max(ingest_seq)`` (``sources/bucket.py`` read/compact).
For that to mean *last write wins* the sequence must be comparable
across write paths — HTTP ``/api/v2/write``, streaming micro-batches,
and direct ``write_points`` calls. Round-1 used per-path schemes
(``batch_id << 40`` vs ``request << 32``) whose numeric order did not
track wall-clock across paths, so a later overwrite via one path could
lose to an earlier write via the other.

Scheme: ``ingest_seq = (epoch_ms << INTRA_BITS) | intra_row_id``.

- The base is allocated process-wide under a lock and bumped to be
  strictly increasing, so two batches allocated in the same
  millisecond still get disjoint, ordered id spaces.
- ``intra`` orders rows *within* one batch. It is
  ``monotonically_increasing_id() % 2**INTRA_BITS``: within a
  partition this is the row index (preserves line order, the InfluxDB
  rule that a later duplicate line in one request wins); across
  partitions of one batch the order is arbitrary — which matches the
  reality of a distributed unordered batch, where no cross-partition
  "later" exists. A wrap collision (two same-key rows in one batch,
  same partition, ≥2^20 rows apart) can only affect rows whose
  relative order was already arbitrary.
- 64-bit budget: epoch_ms needs 41 bits (42 by 2109); 41 + 20 = 61 ≤
  63 signed-long bits, no overflow.

Streaming replay note: a replayed ``foreachBatch`` re-allocates a new
base, so replayed rows are not byte-identical to the originals — but
they carry the same (series, time_ns, field, value), so LWW converges
to the same table regardless of which copy wins; compaction removes
the losers. Value-idempotent, not row-idempotent.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, functions as F

INTRA_BITS = 20

_lock = threading.Lock()
_last_base = 0


def next_seq_base(rows: int = 1) -> int:
    """Allocate a strictly-increasing ``epoch_ms << INTRA_BITS`` base,
    reserving enough stride for ``rows`` sequential intra ids (callers
    that number rows 0..n-1 themselves, like the HTTP write path, pass
    the row count so a >2^20-line request can't bleed into the next
    allocation).

    Driver-side, one call per batch/request — never per row.
    """
    global _last_base
    strides = max(1, -(-rows // (1 << INTRA_BITS)))
    with _lock:
        base = (time.time_ns() // 1_000_000) << INTRA_BITS
        if base <= _last_base:
            base = _last_base + (1 << INTRA_BITS)
        _last_base = base + (strides - 1) * (1 << INTRA_BITS)
        return base


def with_ingest_seq(df: DataFrame, base: int | None = None) -> DataFrame:
    """Stamp ``ingest_seq = base + intra`` onto a points DataFrame."""
    if base is None:
        base = next_seq_base()
    return df.withColumn(
        "ingest_seq",
        F.lit(base) + F.monotonically_increasing_id() % F.lit(1 << INTRA_BITS),
    )
