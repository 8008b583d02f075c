"""Bucketed (co-located) table storage — the shuffle-elimination path
for repeated large-×-large joins.

A fact table bucketed and sorted by its join key joins another table
bucketed the same way with ZERO Exchange nodes: each task reads the
matching bucket file pair and sort-merge-joins in place. At 100 TB
this turns the recurring "events ⋈ entity" join from a full-network
shuffle per query into a local merge per query — the single biggest
repeated-join win Spark offers (SURVEY.md §4; tested exchange-free in
tests/test_scale_bucketing.py).

Buckets are a *write-time* contract: pick ``n_buckets`` so one bucket
of the larger table fits an executor's sort budget (≈ total_size /
n_buckets ≤ a few GB), and use the SAME count on both sides — mismatched
counts fall back to a shuffle on one side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed+sorted by ``keys`` as a catalog table.

    ``path`` makes it an external table (data at ``path``, metadata in
    the session catalog) — the test/local-friendly form; omit it for a
    managed table under ``spark.sql.warehouse.dir``.
    """
    w = df.write.bucketBy(n_buckets, *keys).sortBy(*keys).mode(mode)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (must go
    through the catalog — ``spark.read.parquet`` on the files would
    lose the bucketing metadata and reintroduce the shuffle)."""
    return spark.table(table)
