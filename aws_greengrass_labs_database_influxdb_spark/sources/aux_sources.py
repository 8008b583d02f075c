"""Auxiliary sources (SURVEY.md §2.2.1): csv.from / array.from / sql.from."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def csv_from(spark: SparkSession, path: str, header: bool = True, schema=None) -> DataFrame:
    """Flux ``csv.from(file:)`` — CSV scan (schema strongly recommended
    at scale: inference reads the data twice)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def array_from(spark: SparkSession, rows: Sequence[dict], schema=None) -> DataFrame:
    """Flux ``array.from(rows:)`` — literal rows to a DataFrame."""
    return spark.createDataFrame(rows, schema=schema)


def sql_from(
    spark: SparkSession, url: str, query: str, driver: str | None = None, **options
) -> DataFrame:
    """Flux ``sql.from(driverName:, dataSourceName:, query:)`` — JDBC
    read. Partition options (partitionColumn/lowerBound/upperBound/
    numPartitions) split the read across executors for large tables."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
