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


def sql_to(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "append",
    **options,
) -> None:
    """Flux ``sql.to(driverName:, dataSourceName:, table:)`` — JDBC
    write (the stdlib sibling of :func:`sql_from`; enrichment-table
    export path). ``mode`` maps Flux's implicit append; pass
    ``overwrite`` for replace semantics. At scale, partition count =
    parallel JDBC connections — ``df.coalesce(n)`` to bound them."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
