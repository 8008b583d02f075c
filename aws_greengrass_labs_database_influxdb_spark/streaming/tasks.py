"""Tasks & checks: the engine's scheduled-Flux equivalents.

InfluxDB *tasks* (``option task = {every: ...}`` running
``aggregateWindow |> to()``) are the standard downsampling pattern;
*checks* (the ``monitor`` package) evaluate thresholds over windows and
emit statuses. Both ship inside the pinned image
(``/root/reference/recipe.yaml:110``); Spark-first they become
Structured Streaming jobs:

- :class:`DownsampleTask` — ``readStream`` over a bucket's data dir →
  watermarked tumbling-window aggregate → append to the target bucket
  dir. The watermark bounds state; finalized windows append exactly
  once (idempotent via checkpoint).
- :class:`ThresholdCheck` — same windowed aggregate, but ``foreachBatch``
  evaluates the threshold and publishes ``_monitoring``-style status
  messages to a broker topic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..control.broker import Broker
from ..operators.aggregates import AGG_FNS
from ..sources.bucket import BucketStore


@dataclass
class DownsampleTask:
    """aggregateWindow(every: ...) |> to(bucket: target), continuously."""

    spark: SparkSession
    store: BucketStore
    org: str
    source_bucket: str
    target_path: str
    checkpoint: str
    every: str = "1 hour"
    fn: str = "mean"
    value: str = "f_float"
    watermark: str = "2 hours"

    def start(self, available_now: bool = True, processing_time: str | None = None) -> StreamingQuery:
        src_dir = str(self.store._data_dir(self.org, self.source_bucket))
        schema = self.store._stored_schema()
        stream = self.spark.readStream.schema(schema).parquet(src_dir)
        agg = AGG_FNS[self.fn](F.col(self.value)).alias(self.fn)
        windowed = (
            stream.withWatermark("time", self.watermark)
            .groupBy(
                F.col("measurement"),
                F.col("series_key"),
                F.col("field"),
                F.window("time", self.every).alias("w"),
            )
            .agg(agg)
            .select(
                "measurement",
                "series_key",
                "field",
                F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"),
                self.fn,
            )
        )
        writer = (
            windowed.writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.target_path)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


@dataclass
class ThresholdCheck:
    """monitor-style check: windowed aggregate vs crit/warn thresholds →
    status messages on a broker topic (checks & notifications §2.2.9)."""

    spark: SparkSession
    store: BucketStore
    org: str
    bucket: str
    checkpoint: str
    broker: Broker
    topic: str = "greengrass/monitor/status"
    every: str = "1 hour"
    fn: str = "mean"
    value: str = "f_float"
    crit: float = float("inf")
    warn: float = float("inf")

    def start(self, available_now: bool = True) -> StreamingQuery:
        src_dir = str(self.store._data_dir(self.org, self.bucket))
        schema = self.store._stored_schema()
        stream = self.spark.readStream.schema(schema).parquet(src_dir)
        agg = AGG_FNS[self.fn](F.col(self.value)).alias("_level_value")
        windowed = (
            stream.withWatermark("time", "0 seconds")
            .groupBy(F.col("series_key"), F.window("time", self.every).alias("w"))
            .agg(agg)
        )
        crit, warn, broker, topic = self.crit, self.warn, self.broker, self.topic

        def _sink(batch_df, batch_id: int):
            statuses = batch_df.select(
                "series_key",
                F.col("w.start").cast("string").alias("window_start"),
                F.col("_level_value").alias("value"),
                F.when(F.col("_level_value") >= crit, "crit")
                .when(F.col("_level_value") >= warn, "warn")
                .otherwise("ok")
                .alias("level"),
            )
            for row in statuses.collect():  # status stream is tiny (1 row/series/window)
                broker.publish(topic, row.asDict())

        return (
            windowed.writeStream.outputMode("update")
            .foreachBatch(_sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )


@dataclass
class RollupMaintenanceTask:
    """Continuous materialized-rollup maintenance: keep a
    :class:`~..plans.rollup.RollupCatalog` rollup fresh as points
    stream into its source bucket, so routed ``aggregateWindow``
    queries keep answering from partials instead of falling back to
    raw scans.

    Per micro-batch (``foreachBatch``):

    1. project the batch to the *days it touches* (tiny distinct);
    2. ``refresh_days`` rebuilds exactly those day partitions from the
       bucket's LWW-resolved points (dynamic partition overwrite — a
       re-delivered or late batch converges to the same partition
       content, so retries are idempotent);
    3. the catalog's watermark advances, widening the routable range.

    Rebuild-the-day (not merge-the-delta) is deliberate: LWW overwrites
    can change history, and partial aggregates cannot be decremented —
    day-rebuild from resolved points is the smallest correct unit, and
    its cost is bounded by points-per-day, not bucket size.
    """

    spark: SparkSession
    store: BucketStore
    org: str
    bucket: str
    catalog: object  # plans.rollup.RollupCatalog
    name: str
    checkpoint: str

    def start(self, available_now: bool = True,
              processing_time: str | None = None) -> StreamingQuery:
        from ..plans.rollup import DAY_NS

        src_dir = str(self.store._data_dir(self.org, self.bucket))
        schema = self.store._stored_schema()
        stream = self.spark.readStream.schema(schema).parquet(src_dir)

        def _sink(batch_df, batch_id: int) -> None:
            days = [
                r.d
                for r in batch_df.select(
                    F.expr(f"time_ns div {DAY_NS}").alias("d")
                ).distinct().collect()
            ]
            if not days:
                return
            pts = self.store.read_points(self.org, self.bucket).filter(
                F.expr(f"time_ns div {DAY_NS}").isin(days)
            )
            self.catalog.refresh_days(self.name, pts, days)

        writer = (
            stream.writeStream.outputMode("append")
            .foreachBatch(_sink)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()
