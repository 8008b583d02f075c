"""Continuous line-protocol ingest.

The reference's write path is a telemetry relay POSTing line protocol
continuously (``/root/reference/README.md:292-297``). Spark-first that
is: ``readStream`` over an arrival directory (or any text-shaped
source — socket/Kafka swap in transparently), the same distributed
parser used for batch (``mapInPandas``), and a ``foreachBatch`` append
into the bucket store.

Late/out-of-order data: InfluxDB accepts ANY timestamp and upserts by
(series, time, field). So the raw-point sink must never drop late rows
— no watermark here; watermarks belong to downstream streaming
aggregations (tasks.py), where they bound state, not acceptance.

Idempotence under retries: ``foreachBatch`` can re-deliver a batch.
``ingest_seq`` comes from the shared wall-clock allocator
(:mod:`..sources.seq`) so LWW ordering is consistent with the HTTP
write path; a replay re-stamps the same (series, time, field, value)
rows with a newer base, so state converges to the same values (LWW
keeps one copy, compaction drops the rest) — value-idempotent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources.bucket import BucketStore
from ..sources.lineprotocol import lines_df_to_points
from ..sources.seq import with_ingest_seq


def stream_lineprotocol_ingest(
    spark: SparkSession,
    input_path: str,
    store: BucketStore,
    org: str,
    bucket: str,
    checkpoint: str,
    precision: str = "ns",
    trigger_available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Start the ingest stream: text files of line protocol → points →
    bucket store. Returns the StreamingQuery (caller awaits/stops)."""
    lines = spark.readStream.text(input_path)

    def _sink(batch_df, batch_id: int):
        from ..sources.bucket import FieldTypeConflict

        pts = lines_df_to_points(batch_df, precision=precision)
        try:
            store.write_points(org, bucket, with_ingest_seq(pts))
        except FieldTypeConflict as e:
            # stock relay behavior: the conflicting points are rejected
            # (422 at the write API), the stream keeps flowing — a
            # poison batch must not wedge continuous ingest
            import logging

            logging.getLogger(__name__).warning(
                "ingest batch %s: %s", batch_id, e
            )

    writer = lines.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
