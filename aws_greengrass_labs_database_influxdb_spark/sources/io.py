"""Table loaders for the driver-generated test data.

``events.parquet`` carries parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects by default. We flip
``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) so the
column arrives as epoch-ns LONG — which is exactly our authoritative
``time_ns`` representation. Scan pushdown/pruning is unaffected.

Note on oracle parity: DuckDB's TIMESTAMP is µs — it silently truncates
the same parquet column. ``events_points`` therefore µs-truncates
``time_ns`` so both engines compute on identical values; the engine
itself remains ns-capable (the parser/store keep full ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import FT_FLOAT

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical points, tags promoted to columns.

    Promoted tag columns (``event_type``, ``user_id``) instead of a map:
    parquet min/max stats and dictionary pushdown work on plain string
    columns but not on MapType access — SURVEY.md §4.2 ("materialize hot
    tags").
    """
    ev = load_table(spark, sf_dir, "events")
    # µs-truncate with *integer* arithmetic — double division of epoch-ns
    # (~1.7e18) loses precision (ulp=256 ns) and silently shifts values.
    time_ns = (F.col("ts") - F.col("ts") % 1000).cast("long")
    return ev.select(
        F.lit("events").alias("measurement"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("time"),
        time_ns.alias("time_ns"),
        F.col("event_type"),
        F.col("user_id"),
        F.lit("value").alias("field"),
        F.col("value").alias("f_float"),
        F.lit(FT_FLOAT).alias("ftype"),
        F.col("event_id").alias("ingest_seq"),
        F.col("props"),
        # raw storage time: time_ns above is DERIVED (µs-truncated), so
        # predicates on it can't reach parquet row-group stats; range
        # filters add a superset predicate on this raw column instead
        # (operators.core.push_time_filter) — that one is sargable
        F.col("ts").alias("_ts_raw"),
    )
